package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A declared query: the Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle over the same input tables. The driver runs both at
  * sf0.01 and hash-compares results — so every query orders its output
  * totally and emits only portable scalar types (string/long/int/double
  * passthrough/decimal/exact-IEEE derivations). `bench = true` marks the
  * headline set timed by [[graft.Bench]].
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  lazy val all: Map[String, QueryDef] =
    CdcQueries.defs ++ RelationalQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ AnnQueries.defs ++ MixQueries.defs ++
      SketchQueries.defs ++ GraphQueries.defs

  lazy val benchSet: Seq[String] = all.collect { case (n, d) if d.bench => n }.toSeq.sorted

  /** Recursive delete for the gated queries' temp stores/drops (pair
    * with the collect-into-local-relation idiom: materialize the result
    * BEFORE deleting, since a lazy read would pin the dir). */
  private[graft] def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }
}
