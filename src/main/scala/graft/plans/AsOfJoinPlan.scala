package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class Catalyst operator: logical node → planner
  * strategy → physical merge-scan. This is the (c)-layer of the custom-op
  * ladder (compose built-ins → native expression → custom plan), used
  * where the whole-OPERATOR semantics — "latest right row at or before
  * each left row" — deserve their own physical algorithm.
  *
  * The physical plan is the one you would want on a 1000-executor
  * cluster: both sides hash-clustered on the join keys (EnsureRequirements
  * inserts co-partitioned exchanges + per-partition sorts from the
  * declared requirements), then ONE forward merge pass per partition —
  * no union interleave (the [[graft.operators.AsOfJoin]] formulation
  * carries every left column through the window machinery), no ≤-pair
  * blowup (the naive range-join rewrite), state = one buffered right row.
  *
  * Equal-timestamp right rows tie-break by ascending `rightTieBreak`
  * (last wins ⇒ lexicographic max), matching
  * [[graft.operators.AsOfJoin.asOf]]'s first-writer-wins-descending
  * dedup, so the two implementations are differentially testable.
  * Like the window formulation (and unlike SQL equi-joins), null keys
  * group and match each other.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs, p.rightTieBreak,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  // the merge compares right values with orderings built from the LEFT
  // types, and co-partitioning hashes each side's own keys — a type
  // mismatch would silently mis-partition and mis-compare (equi-joins get
  // this from analyzer coercion; a custom exec must check itself)
  require(leftKeys.length == rightKeys.length &&
    leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType },
    s"as-of key types differ: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of timestamp types differ: ${leftTs.dataType} vs ${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Same-key rows must co-locate; EnsureRequirements co-partitions both
    * exchanges (same partition count, same hash function over the key
    * values), exactly as for shuffled equi-joins.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Within each partition both sides arrive (keys, ts)-sorted; the right
    * side additionally tie-breaks equal timestamps so "last row ≤ ts" is
    * deterministic.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +: rightTieBreak.map(SortOrder(_, Ascending))))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      // bind right attrs as NULLABLE: the merge substitutes an all-null row
      // for unmatched lefts, and a non-nullable BoundReference would skip
      // the null check and read zeros instead
      val outProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      // single buffered right row; projections reuse buffers, so anything
      // retained across next() is copied
      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTs: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next().copy()
          rKey = rKeyProj(rRow).copy()
          rTs = rTsProj(rRow).copy()
        } else { rRow = null; rKey = null; rTs = null }
      advanceRight()

      var lastMatch: InternalRow = null
      var lastMatchKey: InternalRow = null

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTs = lTsProj(l)
        var keyCmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
        while (rRow != null &&
            (keyCmp < 0 || (keyCmp == 0 && tsOrd.compare(rTs, lTs) <= 0))) {
          if (keyCmp == 0) { lastMatch = rRow; lastMatchKey = rKey }
          advanceRight()
          keyCmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
        }
        if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0)
          outProj(joined(l, lastMatch))
        else
          outProj(joined(l, nullRight))
      }
    }
  }
}

/** Public builder: DataFrame-level as-of join planned through
  * [[AsOfJoinExec]]. Output = all left columns + `rightPayload` columns
  * renamed `prefix+name` (null when no right row qualifies) — the same
  * surface as [[graft.operators.AsOfJoin.asOf]].
  */
object AsOfJoinPlan {

  /** Idempotently register [[GraftStrategy]] on the session. */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategy

  def asOfExec(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // re-alias the right side with fresh expression ids so self-joins
    // (left and right built from the same base plan) stay unambiguous
    val rAliases = rPlan0.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rPlan0)
    val rOut = rAliases.map(_.toAttribute)
    def lAttr(n: String): Attribute = lPlan.output.find(_.name == n)
      .getOrElse(sys.error(s"left column not found: $n"))
    def rAttr(n: String): Attribute = rOut.find(_.name == n)
      .getOrElse(sys.error(s"right column not found: $n"))
    val payload = rightPayload.map(rAttr)
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(lAttr(_)), keys.map(rAttr(_)), lAttr(leftTs), rAttr(rightTs), payload)
    val projected = Project(
      lPlan.output ++ payload.zip(rightPayload).map { case (a, n) =>
        Alias(a, prefix + n)()
      },
      node)
    GraftPlanBridge.ofRows(spark, projected)
  }
}
