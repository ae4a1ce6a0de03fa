package graft.queries
object DedupQueries { val defs: Map[String, QueryDef] = Map() }
