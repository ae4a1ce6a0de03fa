package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.op.Compactor

/** Structured Streaming form of the engine: the binlog/Kafka tail analog.
  *
  * The reference's delivery machinery (disruptor ring, ordered acks,
  * statestore positions — SURVEY.md §2.5) maps wholesale onto Spark's
  * micro-batch + checkpoint commit protocol: offsets are persisted after
  * a batch's sinks succeed, giving the same at-least-once contract as
  * ack-gated position persistence; idempotent apply (compact-then-merge)
  * makes replay safe.
  *
  * All transforms here are the SAME functions used in batch
  * ([[graft.op.Processors]], [[Compactor]]) — a table is a bounded
  * changelog, a stream is an unbounded one.
  */
object ChangeStream {

  /** S1 analog — the engine-local change-stream source: the `events`
    * table tailed as an unbounded changelog via the file stream source
    * (`maxFilesPerTrigger` plays the reference's binlog fetch batching;
    * on a real deployment this is `readStream.format("kafka")` +
    * `from_json`, same downstream code). The parquet's TIMESTAMP(NANOS)
    * is declared as long and narrowed to µs, as in the batch source.
    *
    * `slices` > 1 stages the events file as that many range-sliced
    * segment files instead of one, so the bounded drain runs as `slices`
    * micro-batches (`maxFilesPerTrigger`=1) — the shape of a real binlog
    * tail, where state accumulates ACROSS batches. Multi-batch apply is
    * where the incremental sinks' semantics (chain growth, compaction,
    * replay) actually engage; a single-batch drain never exercises them.
    *
    * `sliceBy` picks the slicing column and with it the apply regime:
    *  - `event_id` (default): log order — every batch's keys spray
    *    across all buckets (the uniform-update regime, BucketStore's
    *    worst case and DeltaStore's best);
    *  - `user_id`: key ranges — each batch touches only its own keys'
    *    buckets (the key-partitioned/backfill regime, where
    *    read-modify-write's O(touched) is small). A key's ops stay in
    *    ONE slice, so batch order between a key's ops is preserved
    *    trivially. */
  def fromEventsStream(spark: SparkSession, sfDir: String,
      slices: Int = 1, sliceBy: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // The file stream source tails a DIRECTORY (arriving files = arriving
    // binlog segments). Stage the harness's single events file into a
    // per-(sf, slices) drop dir once; a deployment would point this at
    // the real landing directory instead.
    val drop = java.nio.file.Paths.get("/tmp/graft-stream",
      Integer.toHexString(s"$sfDir#$slices#$sliceBy".hashCode))
    java.nio.file.Files.createDirectories(drop)
    // Staging completion is keyed on a SOURCE marker carrying the input
    // file's (size, mtime), written atomically AFTER the segments: a
    // crash mid-staging re-stages everything (moves are REPLACE, so the
    // retry is idempotent), and a REGENERATED events.parquet at the same
    // path invalidates the staged dir instead of silently serving stale
    // slices to every later drain on this machine.
    val srcFile = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val srcSig = s"${java.nio.file.Files.size(srcFile)}#${
      java.nio.file.Files.getLastModifiedTime(srcFile).toMillis}"
    // the marker lives NEXT TO the drop dir, never inside it: the file
    // stream tails the dir and would try to read the marker as parquet —
    // and a current-mtime file among the 2020-stamped slices would also
    // shift the source's maxFileAge window under the slices
    val marker = drop.resolveSibling(drop.getFileName.toString + ".SOURCE")
    java.nio.file.Files.deleteIfExists(drop.resolve("SOURCE")) // pre-fix leftover
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == srcSig
    if (fresh) {
      // staged and current — nothing to do
    } else graft.PhaseClock.time("stage") { if (slices <= 1) {
      java.nio.file.Files.copy(srcFile, drop.resolve("events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      writeMarker(marker, srcSig)
    } else {
      // range segments preserve binlog order between slices (a key's
      // ops land in batch order), mirroring sequential segment rotation;
      // staged once, reused by every run against this (sf, n, sliceBy)
      val ev = spark.read.schema(schema).parquet(s"$sfDir/events.parquet")
      // an empty source yields one all-null agg row (not zero rows):
      // guard the null, not just headOption, so the drain stays empty
      // instead of throwing on getLong
      val (lo, hi) = ev.agg(min(sliceBy), max(sliceBy)).collect()
        .headOption.filterNot(_.isNullAt(0))
        .map(r => (r.getLong(0), r.getLong(1))).getOrElse((0L, 0L))
      val span = (hi - lo + slices) / slices
      (0 until slices).foreach { i =>
        val out = java.nio.file.Files.createTempDirectory("graft-slice")
        ev.filter(col(sliceBy) >= lo + i * span &&
            col(sliceBy) < lo + (i + 1L) * span)
          .coalesce(1).write.mode("overwrite").parquet(out.toString)
        val part = out.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = drop.resolve(s"slice-$i.parquet")
        java.nio.file.Files.move(part.toPath, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // FileStreamSource orders arriving files by modification time, and
        // the move PRESERVES the tmp part file's mtime — identical stamps
        // fall back to name order, where slice-10 sorts before slice-2 at
        // ≥11 slices and a key's delete could apply before its insert.
        // Stamp a strictly increasing mtime per slice index instead.
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1_600_000_000_000L + i * 1000L))
      }
      writeMarker(marker, srcSig)
    } }
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(drop.toString)
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
    graft.source.Changelog.fromEventsDf(raw)
  }

  private def writeMarker(marker: java.nio.file.Path, sig: String): Unit = {
    val tmp = marker.resolveSibling(s"SOURCE.tmp-${java.util.UUID.randomUUID}")
    java.nio.file.Files.write(tmp,
      sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, marker,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Tumbling-window aggregation with watermark — the streaming form of
    * the `stream_window` declared query. Late events beyond the watermark
    * are dropped; state is bounded by (watermark horizon / slide). */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour",
      window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))

  private val functions = org.apache.spark.sql.functions

  /** Per-micro-batch compaction + merge apply: each batch is compacted
    * (P8) and merged into the target with `Sinks.Merge` semantics via
    * `foreachBatch`. Batch id + idempotent merge ⇒ at-least-once safe. */
  def compactedApply(changelog: DataFrame, checkpoint: String)(
      applyBatch: (DataFrame, Long) => Unit): StreamingQuery =
    changelog.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.PhaseClock.count("batches")
        graft.PhaseClock.time("apply") {
          applyBatch(Compactor.compact(batch.toDF()), id)
        }
      }
      .start()

  /** Cross-batch per-key compaction state (the reference keeps this
    * implicitly in its ring + sink buffers; here it is explicit
    * flatMapGroupsWithState). Because each batch's emission is APPLIED
    * downstream, the carried state tracks applied existence (`inDb`):
    * a delete after an applied insert must emit `delete` (unlike one-shot
    * batch compaction, where insert→delete cancels), and a batch that
    * nets to nothing emits zero rows. */
  case class KeyState(inDb: Boolean, lastSeq: Long,
      rId: Option[Long], rK: Option[Int], rV: Option[Double])

  type FlatEvent = graft.model.FlatEvent
  val FlatEvent: graft.model.FlatEvent.type = graft.model.FlatEvent
  type NetRow = graft.model.NetRow
  val NetRow: graft.model.NetRow.type = graft.model.NetRow

  /** @param ttl evict a key's state after this much processing-time
    * inactivity (None = keep forever). At unbounded key cardinality the
    * state store grows without bound otherwise; after eviction a
    * returning key's `inDb` is re-inferred from its first op — correct
    * as long as the TTL exceeds the source's max replay window.
    * CAVEAT: with a TTL set, run the query under an interval trigger
    * (`Trigger.ProcessingTime(...)`) — pending timeouts make the default
    * as-fast-as-possible trigger busy-loop empty batches, which also
    * starves `processAllAvailable` in tests. */
  def statefulCompact(flat: Dataset[FlatEvent],
      ttl: Option[java.time.Duration] = None): Dataset[NetRow] = {
    import flat.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    flat.groupByKey(e => (e.tbl, e.pk))
      .flatMapGroupsWithState[KeyState, NetRow](
        OutputMode.Update(), timeoutConf) {
        case ((tbl, pk), events, state: GroupState[KeyState]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case ((tbl, pk), events, state: GroupState[KeyState]) =>
          val sorted = events.toSeq.sortBy(_.seq)
          val prev = state.getOption
          val inDbStart = prev.map(_.inDb).getOrElse(sorted.head.op != "insert")
          val lastOp = sorted.last.op
          val lastSeq = sorted.last.seq
          val lastUpsert = sorted.filter(_.op != "delete").lastOption
          val (rId, rK, rV) =
            if (lastOp == "delete") (None, None, None)
            else lastUpsert.map(e => (e.r_id, e.r_k, e.r_v))
              .orElse(prev.map(p => (p.rId, p.rK, p.rV)))
              .getOrElse((None, None, None))
          val netOp =
            if (lastOp == "delete") { if (inDbStart) Some("delete") else None }
            else if (inDbStart) Some("update")
            else Some("insert")
          state.update(KeyState(inDb = lastOp != "delete", lastSeq, rId, rK, rV))
          ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
          netOp.map(op => NetRow(tbl, pk, op, lastSeq, rId, rK, rV)).iterator
      }
  }
}
