package graft.op

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P8 — changelog compaction, the reference's only true aggregation and
  * its highest-leverage operator (batch apply beats stream apply ~2× in
  * the published baseline precisely because of this fold).
  *
  * Semantics follow pipe-s `pkg/output/mysql/batch/batchmessage.go:25-105`:
  * per key, a batch of events folds to one net effect —
  *
  *   - `inDB` (did the key exist before the batch) is inferred from the
  *     first op seen: anything but `insert` implies prior existence
  *     (`batchmessage.go:10-12,33`).
  *   - last op `delete`   → net `delete` if inDB, else the key was born
  *     and killed inside the batch → no-op, row dropped
  *     (`tableprocessor.go:273-290`).
  *   - last op not delete → net `update` if inDB else net `insert`
  *     (delete-then-insert collapses to update, `batchmessage.go:61-72`).
  *   - the surviving row image is that of the last non-delete event.
  *
  * Implementation is pure hash aggregation — `min_by`/`max_by` argmax over
  * the explicit `seq` order. ONE shuffle on the key, map-side partial
  * aggregation for free, no window sort. This is the plan you want at
  * 100 TB: compaction output is proportional to |keys|, not |events|, and
  * it runs before anything expensive (the apply sink) sees the data.
  */
object Compactor {

  import graft.model.{FlatEvent, NetRow}
  import org.apache.spark.sql.{Dataset, Encoder, Encoders}
  import org.apache.spark.sql.expressions.Aggregator

  /** Commutative-merge buffer for the typed aggregator: tracks the
    * argmin/argmax ops by seq plus the latest non-delete row image, so
    * partial buffers from different partitions merge correctly whatever
    * order events arrive in. */
  case class Buf(firstSeq: Long, firstOp: String, lastSeq: Long, lastOp: String,
      upSeq: Long, uId: Option[Long], uK: Option[Int], uV: Option[Double])

  /** P8 as a typed `Aggregator` (the Dataset-native form; same algebra
    * as [[compact]], usable as `ds.groupByKey(e => (e.tbl, e.pk))
    * .agg(Compactor.typed.toColumn)` and inside
    * `KeyValueGroupedDataset` pipelines). */
  val typed: Aggregator[FlatEvent, Option[Buf], Option[NetRow]] =
    new Aggregator[FlatEvent, Option[Buf], Option[NetRow]] {
      def zero: Option[Buf] = None
      def reduce(b: Option[Buf], e: FlatEvent): Option[Buf] = {
        val isDel = e.op == "delete"
        b match {
          case None => Some(Buf(e.seq, e.op, e.seq, e.op,
            if (isDel) Long.MinValue else e.seq,
            if (isDel) None else e.r_id, if (isDel) None else e.r_k,
            if (isDel) None else e.r_v))
          case Some(x) =>
            var r = x
            if (e.seq < r.firstSeq) r = r.copy(firstSeq = e.seq, firstOp = e.op)
            if (e.seq > r.lastSeq) r = r.copy(lastSeq = e.seq, lastOp = e.op)
            if (!isDel && e.seq > r.upSeq)
              r = r.copy(upSeq = e.seq, uId = e.r_id, uK = e.r_k, uV = e.r_v)
            Some(r)
        }
      }
      def merge(a: Option[Buf], b: Option[Buf]): Option[Buf] = (a, b) match {
        case (None, y) => y
        case (x, None) => x
        case (Some(x), Some(y)) =>
          val (f, l) = (if (x.firstSeq <= y.firstSeq) x else y,
            if (x.lastSeq >= y.lastSeq) x else y)
          val u = if (x.upSeq >= y.upSeq) x else y
          Some(Buf(f.firstSeq, f.firstOp, l.lastSeq, l.lastOp,
            u.upSeq, u.uId, u.uK, u.uV))
      }
      def finish(b: Option[Buf]): Option[NetRow] = b.flatMap { x =>
        if (x.lastOp == "delete") {
          if (x.firstOp == "insert") None // born and killed in-batch
          else Some(NetRow(null, -1, "delete", x.lastSeq, None, None, None))
        } else {
          val op = if (x.firstOp == "insert") "insert" else "update"
          Some(NetRow(null, -1, op, x.lastSeq, x.uId, x.uK, x.uV))
        }
      }
      def bufferEncoder: Encoder[Option[Buf]] = Encoders.product
      def outputEncoder: Encoder[Option[NetRow]] = Encoders.product
    }

  /** Typed-path compaction over a Dataset (key re-attached post-agg). */
  def compactTyped(ds: Dataset[FlatEvent]): Dataset[NetRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(e => (e.tbl, e.pk))
      .agg(typed.toColumn)
      .flatMap { case ((tbl, pk), net) =>
        net.map(n => n.copy(tbl = tbl, pk = pk))
      }
  }

  /** Illegal transition detection (the reference hard-errors on e.g.
    * update-after-delete, `batchmessage.go:44-52`; at pipeline scale a
    * hard error on one key poisons the batch, so the engine QUARANTINES
    * instead): emits the offending (tbl, pk, seq, prev_op, op) rows —
    * route them to a dead-letter sink and compact the rest. */
  def quarantine(changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("tbl", "pk").orderBy("seq")
    changelog
      .withColumn("prev_op", lag("op", 1).over(w))
      .filter(
        (col("prev_op") === "delete" && col("op") =!= "insert") ||
          (col("prev_op").isin("insert", "update") && col("op") === "insert"))
      .select("tbl", "pk", "seq", "prev_op", "op")
  }

  /** Flat-schema compaction: group by (tbl, pk), carrying typed row
    * columns `r_id, r_k, r_v`.
    *
    * The op column is argmin/argmax'ed as an INT code, not the string:
    * string-typed aggregation buffers force SortAggregate (immutable
    * buffer fields can't live in the hash map), which costs a
    * per-partition sort; with every buffer field fixed-width the plan is
    * pure partial+final HashAggregate — one shuffle, no sorts. */
  def compact(changelog: DataFrame): DataFrame = {
    val opCode = when(col("op") === "insert", 0)
      .when(col("op") === "update", 1).otherwise(2)
    def decode(c: org.apache.spark.sql.Column) =
      when(c === 0, "insert").when(c === 1, "update").otherwise("delete")
    val agg = changelog
      .withColumn("op_c", opCode)
      .groupBy(col("tbl"), col("pk"))
      .agg(
        expr("min_by(op_c, seq)").as("first_c"),
        expr("max_by(op_c, seq)").as("last_c"),
        max("seq").as("last_seq"),
        // row image of the last non-delete event (argmax over a seq that
        // is NULL for deletes — null ordering keys are ignored by max_by)
        expr("max_by(r_id, CASE WHEN op_c <> 2 THEN seq END)").as("u_id"),
        expr("max_by(r_k,  CASE WHEN op_c <> 2 THEN seq END)").as("u_k"),
        expr("max_by(r_v,  CASE WHEN op_c <> 2 THEN seq END)").as("u_v"))
      .withColumn("first_op", decode(col("first_c")))
      .withColumn("last_op", decode(col("last_c")))
    agg
      // insert-then-delete inside the batch → no-op
      .filter(!(col("last_op") === "delete" && col("first_op") === "insert"))
      .select(
        col("tbl"), col("pk"),
        when(col("last_op") === "delete", "delete")
          .when(col("first_op") === "insert", "insert")
          .otherwise("update").as("net_op"),
        when(col("last_op") === "delete", lit(null)).otherwise(col("u_id")).as("r_id"),
        when(col("last_op") === "delete", lit(null)).otherwise(col("u_k")).as("r_k"),
        when(col("last_op") === "delete", lit(null)).otherwise(col("u_v")).as("r_v"),
        col("last_seq"))
  }
}
