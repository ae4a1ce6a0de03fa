package graft.model

import org.apache.spark.sql.types._

/** Canonical row-change event — the engine's core record.
  *
  * Mirrors the reference's `DBChangeEvent` (pipe-s
  * `pkg/core/message.go:172-182`): a change captured from a source
  * (binlog/scan/Kafka in the reference; parquet/Kafka/rate sources here),
  * carrying named old/new row images and an explicit total order.
  *
  * Two deviations from the reference, both deliberate:
  *   - `sequence` is an explicit column. The reference gets total order
  *     implicitly from its disruptor ring (`pkg/pipeline/simple/disruptor.go`);
  *     on Spark order must survive shuffles, so it is data, not topology.
  *   - Row images are `Map[String,String]` (schema-on-read). Typed tables
  *     use flat columns instead — see [[graft.source.Changelog]]'s flat
  *     schema, which is what the declared queries run on.
  */
final case class ChangeEvent(
    id: String,
    database: String,
    table: String,
    db_time: Long,
    event_time: Long,
    sequence: Long,
    operation: String, // insert | update | delete
    old_row: Map[String, String], // null for insert
    new_row: Map[String, String], // null for delete
    extra: Map[String, String])

/** Flat typed changelog record (the harness's concrete table shape — see
  * [[graft.source.Changelog]] for the schema contract). */
final case class FlatEvent(seq: Long, pk: Long, tbl: String, op: String,
    r_id: Option[Long], r_k: Option[Int], r_v: Option[Double])

/** Net effect of compacting one key's events (P8 output). */
final case class NetRow(tbl: String, pk: Long, net_op: String, last_seq: Long,
    r_id: Option[Long], r_k: Option[Int], r_v: Option[Double])

object ChangeEvent {
  object Op {
    val Insert = "insert"
    val Update = "update"
    val Delete = "delete"
    val all: Seq[String] = Seq(Insert, Update, Delete)
  }

  /** Spark schema of the canonical event (map-typed row images). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("db_time", LongType),
    StructField("event_time", LongType),
    StructField("sequence", LongType),
    StructField("operation", StringType),
    StructField("old_row", MapType(StringType, StringType)),
    StructField("new_row", MapType(StringType, StringType)),
    StructField("extra", MapType(StringType, StringType))
  ))
}
