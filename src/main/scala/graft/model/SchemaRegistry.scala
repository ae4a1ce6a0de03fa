package graft.model

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Table-metadata registry — the engine's `SimpleSchemaStore` analog
  * (pipe-s `pkg/schema/simple.go:72-166`: lazy fetch + cache + DDL
  * invalidation). Differences that matter on Spark:
  *
  *   - schemas are self-describing (parquet footers / catalog), so the
  *     fetch is a metadata read, not a `SHOW COLUMNS` round trip;
  *   - what parquet does NOT carry is PRIMARY-KEY identity — the one
  *     piece every keyed operator (compaction, merge, checker, routing)
  *     needs — so the registry's real payload is the PK map;
  *   - `invalidate` is the DDL-event hook (the reference invalidates on
  *     parsed binlog DDL; here a schema-drift detector or catalog event
  *     listener calls it).
  */
final class SchemaRegistry(spark: SparkSession, baseDir: String) {

  final case class TableMeta(name: String, schema: StructType, pkCols: Seq[String])

  private val cache = new ConcurrentHashMap[String, TableMeta]()

  /** PK identity for the harness tables (the catalog the reference
    * derives from `SHOW COLUMNS`' Key flag). */
  val pkCatalog: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"), "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"), "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def get(table: String): TableMeta =
    cache.computeIfAbsent(table, t => {
      val schema = spark.read.parquet(s"$baseDir/$t.parquet").schema
      TableMeta(t, schema, pkCatalog.getOrElse(t, Seq.empty))
    })

  /** DDL-event hook: drop the cached entry; next access re-reads. */
  def invalidate(table: String): Unit = cache.remove(table)

  /** Drift detector — the engine's stand-in for the reference's
    * binlog-DDL trigger (`binloginput.go:483-497`: parsed DDL →
    * `schema.DeleteTable`). Spark has no DDL stream for parquet dirs, so
    * drift is observed at the storage layer instead: re-read the footer
    * schema and compare with the cache. On drift the entry is invalidated
    * (so the next `get` serves the new schema) and the (old, new) pair is
    * returned for the caller's logging/quarantine policy. Cheap — a
    * footer read, no data scan — so callers can run it per micro-batch. */
  def detectDrift(table: String): Option[(StructType, StructType)] =
    Option(cache.get(table)).flatMap { cached =>
      val current = spark.read.parquet(s"$baseDir/$table.parquet").schema
      if (current != cached.schema) {
        invalidate(table)
        Some((cached.schema, current))
      } else None
    }

  def cachedTables: Set[String] = {
    val s = Set.newBuilder[String]
    cache.forEach((k, _) => s += k)
    s.result()
  }
}
