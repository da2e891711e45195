package graft.queries

/** Placeholders — filled in as each SURVEY §2 tier lands. */
object TextQueries { def qs: Seq[Q] = Seq() }
object VectorQueries { def qs: Seq[Q] = Seq() }
object StreamingQueries { def qs: Seq[Q] = Seq() }
