package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Changelog-shaped sources over the harness parquet tables.
  *
  * The reference unifies tables and streams: a full-table scan emits the
  * same per-row DML events as the binlog tail (pipe-s
  * `pkg/input/mysql/scan/scaninput.go:193-208` — every scanned row becomes
  * an `insert`). We keep that model: every source yields a DataFrame with
  * the flat changelog schema
  *
  * {{{
  *   seq long        -- total order (explicit; ring order in the reference)
  *   pk long         -- routing/compaction key
  *   db string, tbl string            -- physical addressing
  *   op string       -- insert | update | delete
  *   r_id long, r_k int, r_v double   -- typed row image ("sbtest"-ish shape)
  *   event_time timestamp
  * }}}
  *
  * The same transformations run over `spark.read` (scan analog) and
  * `spark.readStream` (binlog analog) — see [[graft.streaming.ChangeStream]].
  */
object Changelog {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Synthetic CDC stream derived deterministically from the `events`
    * table (the harness analog of a binlog tail; mapping fixed by
    * FIXTURES.md §2.3):
    * signup→insert, error→delete, anything else→update; `user_id` is the
    * PK, `event_id` the total order, and the physical table is sharded
    * `sbtest<user_id%10>` to exercise the logical-name operators
    * (reference sharding fixture `pkg/processor/value/dbtablename_test.go`).
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    fromEventsDf(events(spark, sfDir))

  /** Harness fixtures have carried `events.ts` in two physical shapes:
    * TIMESTAMP(NANOS) (readable only as a raw ns-since-epoch long under
    * `nanosAsLong`, the pre-round-12 fixtures) and plain `timestamp[us]`
    * (the regenerated fixtures, read as TIMESTAMP_NTZ). Normalize either
    * to the pair the engine uses everywhere: `ts` TIMESTAMP (µs instant)
    * + `ts_ns` LONG (ns since epoch). Sessions run with UTC timezone, so
    * the NTZ→instant cast is value-preserving. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(spark, sfDir, "events"))
  }

  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => // legacy TIMESTAMP(NANOS) surfaced as ns-long
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — " +
            "expected long (legacy nanos) or timestamp")
    }
  }

  def fromEventsDf(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("seq"),
      col("user_id").as("pk"),
      lit("srcdb").as("db"),
      concat(lit("sbtest"), (col("user_id") % 10).cast("string")).as("tbl"),
      when(col("event_type") === "signup", "insert")
        .when(col("event_type") === "error", "delete")
        .otherwise("update").as("op"),
      col("user_id").as("r_id"),
      get_json_object(col("props"), "$.k").cast("int").as("r_k"),
      col("value").as("r_v"),
      col("ts").as("event_time")
    )

  /** The DuckDB-SQL spelling of [[fromEvents]], prepended (as a CTE) to
    * every changelog-query oracle so Spark and the oracle derive the
    * identical stream. */
  val oracleCte: String =
    """WITH changelog AS (
      |  SELECT event_id AS seq, user_id AS pk,
      |         'srcdb' AS db,
      |         'sbtest' || CAST(user_id % 10 AS VARCHAR) AS tbl,
      |         CASE event_type WHEN 'signup' THEN 'insert'
      |                         WHEN 'error'  THEN 'delete'
      |                         ELSE 'update' END AS op,
      |         user_id AS r_id,
      |         CAST(json_extract(props, '$.k') AS INTEGER) AS r_k,
      |         value AS r_v,
      |         ts AS event_time
      |  FROM events
      |)""".stripMargin

  /** Bounded snapshot scan (reference `MysqlScanInput`): a base table as a
    * changelog of inserts. The reference keyset-paginates with
    * `WHERE pk >= cursor ORDER BY pk LIMIT n` per table
    * (`scaninput.go:353-402`); Spark parallelizes the scan natively by
    * parquet row-group splits, so the "page" here is purely logical
    * (seq = dense rank of the PK) and no cursor state is needed — a
    * bounded source re-runs deterministically.
    */
  def scan(spark: SparkSession, sfDir: String, name: String, pkCol: String): DataFrame =
    graft.op.Seqs.globalSeq(table(spark, sfDir, name), pkCol)
      .withColumn("op", lit("insert"))

  /** Multi-table scan front-end (reference `MysqlScanInput` table listing,
    * `pkg/input/mysql/scan/scaninput.go:126-191`: regex over
    * `INFORMATION_SCHEMA.TABLES`, then N concurrent per-table scanners).
    * Here: regex over the directory's parquet tables; each match is
    * scanned as a bounded changelog of inserts in the CANONICAL map-typed
    * shape (`row` as `map<string,string>` in column order), so shards
    * with different schemas union cleanly — exactly why the reference
    * emits named maps. Per-table `seq` = dense PK rank; PK identity from
    * the schema registry. Spark runs the per-table scans as one unioned
    * job — the reference's scanner concurrency, scheduled by the engine. */
  def scanTables(spark: SparkSession, sfDir: String, pattern: String): DataFrame = {
    val registry = new graft.model.SchemaRegistry(spark, sfDir)
    val names = Option(new java.io.File(sfDir).list()).getOrElse(Array.empty[String])
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet"))
      .filter(_.matches(pattern)).sorted
    require(names.nonEmpty, s"no tables in $sfDir match $pattern")
    names.map { name =>
      val pkCols = registry.get(name).pkCols
      require(pkCols.nonEmpty, s"no PK registered for $name")
      val df = table(spark, sfDir, name)
      val cols = df.columns.toSeq
      graft.op.Seqs.globalSeqBy(df, pkCols)
        .select(
          lit("srcdb").as("db"),
          lit(name).as("tbl"),
          lit("insert").as("op"),
          col("seq"),
          concat_ws("|", pkCols.map(c => col(c).cast("string")): _*).as("pk"),
          map_from_arrays(
            array(cols.map(lit): _*),
            array(cols.map(c => col(c).cast("string")): _*)).as("row"))
    }.reduce(_ unionByName _)
  }

  /** Canonical map-typed form of the flat changelog (the reference's
    * `DBChangeEvent` named-map stage, `pkg/core/message.go:172-182`):
    * insert carries only `new_row`, delete only `old_row`, update both
    * (`binloginput.go:446-473`). */
  def toCanonical(flat: DataFrame): DataFrame = {
    val rowMap = map(
      lit("id"), col("r_id").cast("string"),
      lit("k"), col("r_k").cast("string"),
      lit("v"), col("r_v").cast("string"))
    flat.select(
      concat_ws(".", lit("uuid"), col("pk").cast("string"), col("seq").cast("string")).as("id"),
      col("db").as("database"),
      col("tbl").as("table"),
      (unix_timestamp(col("event_time"))).as("db_time"),
      (unix_timestamp(col("event_time")) * 1000L).as("event_time"),
      col("seq").as("sequence"),
      col("op").as("operation"),
      when(col("op") =!= "insert", rowMap).as("old_row"),
      when(col("op") =!= "delete", rowMap).as("new_row"),
      map().cast("map<string,string>").as("extra")
    )
  }
}
