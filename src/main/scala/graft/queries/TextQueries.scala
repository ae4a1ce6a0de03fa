package graft.queries
object TextQueries { val defs: Map[String, QueryDef] = Map() }
