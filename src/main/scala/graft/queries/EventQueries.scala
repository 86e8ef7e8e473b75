package graft.queries
import graft.GraftQuery
object EventQueries {
  val all: Seq[GraftQuery] = Seq()
}
