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

  /** Flat-schema compaction: group by (tbl, pk), carrying typed row
    * columns `r_id, r_k, r_v`. */
  def compact(changelog: DataFrame): DataFrame = {
    val agg = changelog
      .groupBy(col("tbl"), col("pk"))
      .agg(
        expr("min_by(op, seq)").as("first_op"),
        expr("max_by(op, seq)").as("last_op"),
        max("seq").as("last_seq"),
        // row image of the last non-delete event (argmax over a seq that
        // is NULL for deletes — null ordering keys are ignored by max_by)
        expr("max_by(r_id, CASE WHEN op <> 'delete' THEN seq END)").as("u_id"),
        expr("max_by(r_k,  CASE WHEN op <> 'delete' THEN seq END)").as("u_k"),
        expr("max_by(r_v,  CASE WHEN op <> 'delete' THEN seq END)").as("u_v"))
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
