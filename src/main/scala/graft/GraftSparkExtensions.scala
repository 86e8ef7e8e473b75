package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-build-time injection of graft's SQL surface — configure
  * `spark.sql.extensions=graft.GraftSparkExtensions` and every session
  * (including thriftserver/connect sessions that never run Scala code)
  * gets the native functions without a registration call.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.functionSet.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
  }
}
