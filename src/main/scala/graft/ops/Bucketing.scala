package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-layout writes: the pre-shuffle that repeated joins amortize.
  *
  * A fact⋈fact join (orders ⋈ lineitem class) shuffles BOTH sides on
  * the key every time it runs. Writing each table bucketed by the join
  * key pays that shuffle once at write time; every subsequent join
  * co-locates on the bucket id with ZERO exchanges — at 100 TB that is
  * the difference between re-moving the dataset per query and reading
  * it in place. `sortBy` inside each bucket additionally removes the
  * join's sort: with `spark.sql.legacy.bucketedTableScan.outputOrdering`
  * on, the scan reports per-bucket ordering and SortMergeJoin needs no
  * Sort at all (Spark only honors the report for single-file buckets,
  * which the writer guarantees); with it off the sorted files still pay
  * via row-group locality and tighter page min/max stats.
  *
  * Spark only preserves the per-bucket sorted property when each bucket
  * holds ONE file, so the writer repartitions by the key into exactly
  * `buckets` partitions first (also what a 1000-executor writer wants:
  * one task per bucket file).
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table at `path`,
    * registered in the session catalog as `name` (replacing any prior
    * registration — the data lives at `path`, not the warehouse). */
  def writeBucketed(spark: SparkSession, df: DataFrame, name: String,
      path: String, key: String, buckets: Int): Unit = {
    // `name` reaches raw SQL and a catalog drop: accept plain
    // identifiers only (config-supplied — an interpolated or typo'd
    // name must not clobber an unrelated registered table), and refuse
    // to drop an existing same-named table that lives elsewhere
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"bucketed table name must be a plain identifier, got '$name'")
    if (spark.catalog.tableExists(name)) {
      val loc = scala.util.Try(
        spark.sql(s"DESCRIBE TABLE EXTENDED `$name`")
          .filter(col("col_name") === "Location")
          .collect().headOption.map(_.getString(1))).toOption.flatten
      val target = new java.io.File(path).getCanonicalPath
      // an UNREADABLE location (view, describe failure, no Location
      // row) must refuse, not fall through: treating "can't tell" as
      // "matches" is exactly the unrelated-object clobbering this
      // guard exists to prevent
      require(loc.isDefined,
        s"refusing to drop '$name': cannot determine the existing " +
          "object's location (it may be a view, or DESCRIBE failed) — " +
          "choose another name or drop it manually")
      val existing =
        new java.io.File(loc.get.stripPrefix("file:")).getCanonicalPath
      require(existing == target,
        s"refusing to drop table '$name': it points at $existing, " +
          s"not the configured path $target — choose another name")
    }
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.repartition(buckets, col(key))
      .write.format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(name)
  }

  /** Co-located equi-join of two bucketed tables (each bucketed by its
    * own join key, same bucket count). The plan this produces — and
    * ScaleSpec pins — has no Exchange feeding the join (and no Sort
    * either when the sorted-scan report is enabled; see class doc).
    * When both sides name the key identically (the fact⋈fact shape the
    * class doc advertises) the join uses the USING form — a raw
    * `col(k) === col(k)` condition would be ambiguous against the
    * joined plan and throw. */
  def cojoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val (l, r) = (spark.table(leftTable), spark.table(rightTable))
    if (leftKey == rightKey) l.join(r, leftKey)
    else l.join(r, l(leftKey) === r(rightKey))
  }
}
