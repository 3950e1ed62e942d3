package graft.queries

/** Extension operators (SURVEY.md §7.5): dedup, similarity search, text
  * analysis, multimodal, event-time. Populated incrementally. */
object ExtQueries {
  val all: Seq[Q] = Seq.empty
}
