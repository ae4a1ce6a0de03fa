package graft.queries
object AnnQueries { val defs: Map[String, QueryDef] = Map() }
