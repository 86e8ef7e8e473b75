package graft.queries
import graft.GraftQuery
object SimilarityQueries {
  val all: Seq[GraftQuery] = Seq()
}
