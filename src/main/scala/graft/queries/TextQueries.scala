package graft.queries
import graft.GraftQuery
object TextQueries {
  val all: Seq[GraftQuery] = Seq()
}
