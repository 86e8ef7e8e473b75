package graft.queries
import graft.GraftQuery
object DedupQueries {
  val all: Seq[GraftQuery] = Seq()
}
