package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see SURVEY.md §7 and the query registry in
  * [[graft.queries]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Changelog compaction (P8) — the reference's highest-leverage operator. */
  def entry(spark: SparkSession): DataFrame =
    graft.op.Compactor.compact(
      graft.source.Changelog.fromEvents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (n, d) => n -> d.fn }

  /** DuckDB-equivalent SQL per query (driver correctness oracle). */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (n, d) if d.oracle.isDefined => n -> d.oracle.get }
}
