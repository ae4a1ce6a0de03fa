package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink library. The reference's MySQL sinks are wire-protocol appliers;
  * here the apply semantics are expressed as (a) pure SQL-statement
  * generation (testable without a database, pluggable into a JDBC
  * `foreachPartition` writer) and (b) pure DataFrame merge algebra (the
  * state-transition the statements would effect, used by tests and by
  * parquet-target application).
  */
object Sinks {

  /** K4 `KafkaOutput` (`pkg/output/kafka/kafkaoutput.go`): project the
    * change stream to Kafka's (key, value, topic) contract — key from the
    * partition-key column (hash partitioning ⇒ per-key ordering), value
    * the JSON-marshalled event, topic from a routed column. The result
    * plugs into `.write[Stream].format("kafka")` unchanged. */
  def kafkaProjection(df: DataFrame, keyCol: String, topicCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"),
      col(topicCol).as("topic"))

  /** K5 `LogOutput` — console sink. */
  def console(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  /** K6 `DummyOutput` — null sink (noop format; forces full evaluation,
    * used by the benchmark harness exactly like the reference's). */
  def noop(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).format("noop").save()

  /** K7 `DebugOutput` — breakpoint sink (`pkg/output/debug/output.go:18-25`). */
  def debug(df: DataFrame, idCol: String, idValue: Long): Unit =
    df.filter(col(idCol) === idValue).show(truncate = false)
}

/** K1/K2 SQL statement generation (`pkg/utils/mysql.go:159-218`,
  * `pkg/output/mysql/batch/tableprocessor.go:198-257`): idempotent,
  * batch-shaped statements from net change rows. Pure functions — the
  * JDBC writer calls these per partition; tests assert the strings. */
object SqlGen {

  private def q(ident: String) = s"`$ident`"

  /** Multi-row idempotent insert (`INSERT IGNORE ... VALUES (...),(...)`).
    * The reference caps at SqlBatchSize=1000 rows per statement. */
  def insertIgnore(table: String, cols: Seq[String], rows: Seq[Seq[Any]]): String = {
    val vals = rows.map(r => r.map(render).mkString("(", ",", ")")).mkString(",")
    s"INSERT IGNORE INTO ${q(table)} (${cols.map(q).mkString(",")}) VALUES $vals"
  }

  /** Single-row PK update; null column → DEFAULT(col)
    * (`utils/mysql.go:167-169`). */
  def update(table: String, pkCols: Seq[String], row: Map[String, Any]): String = {
    val sets = row.filterNot { case (k, _) => pkCols.contains(k) }
      .map { case (k, v) =>
        if (v == null) s"${q(k)}=DEFAULT(${q(k)})" else s"${q(k)}=${render(v)}" }
      .mkString(",")
    val where = pkCols.map(k => s"${q(k)}=${render(row(k))}").mkString(" AND ")
    s"UPDATE ${q(table)} SET $sets WHERE $where"
  }

  /** Batched delete on a single-column PK (`DELETE ... WHERE pk IN (...)`). */
  def deleteIn(table: String, pkCol: String, keys: Seq[Any]): String =
    s"DELETE FROM ${q(table)} WHERE ${q(pkCol)} IN (${keys.map(render).mkString(",")})"

  private def render(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case other => other.toString
  }
}

/** The state-transition semantics of the batch apply (K2): given a target
  * table state and a compacted net-change set, produce the post-apply
  * state. Pure DataFrame algebra — one outer join — so the contract the
  * SQL statements implement is testable and usable directly against
  * parquet targets. At scale this is the classic merge: shuffle both
  * sides by PK once, or broadcast the (small, compacted) change set. */
object Merge {

  /** @param target  current state, one row per pk
    * @param changes compacted net changes: pk cols + `net_op` + value cols
    */
  def applyNetChanges(target: DataFrame, changes: DataFrame, pkCols: Seq[String]): DataFrame = {
    val valueCols = target.columns.filterNot(pkCols.contains)
    val c = changes.select(
      pkCols.map(col) ++ Seq(col("net_op")) ++
        valueCols.map(v => col(v).as(s"c_$v")): _*)
    target.join(c, pkCols, "full_outer")
      .filter(coalesce(col("net_op"), lit("keep")) =!= "delete")
      .select(pkCols.map(col) ++ valueCols.map(v =>
        when(col("net_op").isNotNull, col(s"c_$v")).otherwise(col(v)).as(v)): _*)
  }
}
