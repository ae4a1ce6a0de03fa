package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sink.BucketStore

/** Streaming corpus admission — incremental dedup in its full
  * production shape. Each arriving micro-batch of documents is:
  *
  *   1. deduped WITHIN the batch (any doc with a verified near-dup of
  *      lower id is rejected — the deterministic keep-first policy);
  *   2. checked AGAINST the persisted corpus signature store
  *      (new-vs-corpus candidates only, [[Dedup.lshCandidatesAgainst]]
  *      — corpus×corpus pairs never form);
  *   3. survivors' shingle sets + MinHash signatures are merged INTO
  *      the store ([[graft.sink.BucketStore]]: pk-bucketed generations,
  *      atomic MANIFEST flip), so a later batch dedupes against
  *      everything admitted before it.
  *
  * Replay safety end to end: the store merge is generation-keyed by
  * batch id (an at-least-once redelivery overwrites its own partial
  * output, and a flip that already happened is detected and skipped),
  * and the admission decision is deterministic given (batch, store
  * state), so re-running an uncommitted batch converges.
  *
  * Scale notes: signatures are computed once per arriving doc (map-only);
  * the corpus side is ONE scan per batch of the PERSISTED banded store —
  * `bands` pre-derived (doc_id, band, key) rows per stored doc, written
  * at admission time alongside the signatures — so candidate generation
  * never re-derives bands from `perms` stored hashes; candidates meet on
  * the (band, key) shuffle key, and verification touches candidate pairs
  * only, reading shingle sets straight from the signature store. A store
  * written before the banded form existed is backfilled in one pass on
  * its first post-upgrade batch.
  *
  * The two stores flip independently (signatures first), both
  * generation-keyed by batch id. A crash between the flips leaves the
  * band store one batch behind; the checkpoint has not committed, so the
  * batch replays: the admission decision recomputes identically (its
  * candidate input — the band store — is in its pre-batch state; the
  * within-batch check is deterministic), the signature merge detects its
  * already-flipped generation and skips, and the band merge completes.
  */
object Admission {

  /** @param target     BucketStore directory for the signature store
    * @param checkpoint streaming checkpoint dir
    * @param threshold  Jaccard rejection threshold on trigram shingles
    * @param perms      MinHash permutations (bands*rows must equal it) */
  final case class Config(target: String, checkpoint: String,
      threshold: Double = 0.5, perms: Int = 8, bands: Int = 4, rows: Int = 2,
      nBuckets: Int = 16) {
    require(bands * rows == perms, "bands*rows must equal perms")
    /** Sibling store holding the corpus's banded form, (doc_id, band) → key. */
    def bandTarget: String = s"$target.bands"
  }

  /** (doc_id, sh, sig) for a (doc_id, text) frame — the store's schema. */
  private[graft] def signatures(docs: DataFrame, perms: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs.filter(size(toks) >= 3)
      .select(col("doc_id"), array_distinct(Dedup.shingles(toks)).as("sh"))
      .withColumn("sig", Dedup.minhashFast(col("sh"), perms).cast("array<string>"))
  }

  /** Verified near-dup pairs above the threshold, given candidate
    * (leftId, rightId) pairs and per-side shingle frames. */
  private def verified(cand: DataFrame, leftSh: DataFrame, rightSh: DataFrame,
      leftId: String, rightId: String, threshold: Double): DataFrame = {
    val (inter, uni, _) = Dedup.jaccardCols(col("_lsh"), col("_rsh"))
    cand.join(leftSh.select(col("doc_id").as(leftId), col("sh").as("_lsh")), leftId)
      .join(rightSh.select(col("doc_id").as(rightId), col("sh").as("_rsh")), rightId)
      .filter(inter * 1.0 / uni >= threshold)
      .select(leftId, rightId)
  }

  /** Admit one batch: merges the admitted signature rows into the store
    * and returns how many were admitted. (Deliberately NOT the lazy
    * admitted frame: after the store flip GCs superseded generations, a
    * recomputation of that plan could read deleted files — the count is
    * materialized while the pre-flip cache is still live.) Callable
    * directly for batch pipelines; [[admissionStream]] drives it per
    * micro-batch. */
  def admitBatch(batch: DataFrame, cfg: Config, batchId: Long): Long = {
    val spark = batch.sparkSession
    val sig = signatures(batch, cfg.perms).cache()
    try {
      val bands = Dedup.lshBands(sig, "sig", cfg.bands, cfg.rows, "doc_id")

      // 1. within-batch keep-first, EDGE-based: the higher id of any
      // verified pair is rejected even if the lower id itself gets
      // rejected against the corpus — near-dup chains collapse
      // transitively. (Deliberate: clique-aware admission would need a
      // driver-side iterative pass; the edge policy is the standard
      // MinHash-dedup keep-first, and its only batching sensitivity is
      // the degenerate chain case where the surviving endpoint of a
      // pair is itself corpus-rejected.)
      val selfRejected = verified(Dedup.lshCandidates(bands, "doc_id"), sig, sig,
        "b_id", "a_id", cfg.threshold) // b_id = higher id (lshCandidates: a < b)
        .select(col("b_id").as("doc_id")).distinct()

      // 2. vs the persisted corpus: candidates from the banded store
      // (pre-derived band rows — no per-batch re-derivation from stored
      // signatures), shingles for verification from the signature store.
      // A store predating the banded form derives bands one last time.
      val storeOpt = BucketStore.read(spark, cfg.target)
      val bandStoreOpt = BucketStore.read(spark, cfg.bandTarget)
      val corpusRejected = storeOpt match {
        case None => selfRejected.limit(0)
        case Some(store) =>
          val corpBands = bandStoreOpt
            .map(_.select("doc_id", "band", "key"))
            .getOrElse(Dedup.lshBands(store, "sig", cfg.bands, cfg.rows, "doc_id"))
          verified(Dedup.lshCandidatesAgainst(bands, corpBands, "doc_id"),
            sig, store, "new_id", "corpus_id", cfg.threshold)
            .select(col("new_id").as("doc_id")).distinct()
      }

      // 3. merge survivors into the stores (generation-keyed: replay-safe)
      val admitted = sig
        .join(selfRejected.unionByName(corpusRejected), Seq("doc_id"), "left_anti")
        .cache()
      try {
        val n = admitted.count() // materialize before the flip GCs old gens
        BucketStore.merge(admitted.withColumn("net_op", lit("insert")),
          cfg.target, Seq("doc_id"), cfg.nBuckets, batchId)
        // band rows for the survivors; with no band store yet (fresh
        // store OR pre-banded upgrade), backfill the WHOLE corpus in one
        // pass — from a fresh post-flip read of the signature store
        // (which now includes this batch), never from the pre-flip plan
        // whose generations the flip just GC'd
        // .getOrElse(admitted): when the first-ever batch admitted nothing
        // (empty batch, or every doc under the <3-token guard) the
        // signature merge no-ops and the store still doesn't exist — an
        // absent store means there is nothing to backfill, and the empty
        // admitted frame makes the band merge a no-op too (a bare .get
        // would crash the stream, and replay would wedge on the same state)
        val bandSrc =
          if (bandStoreOpt.isEmpty)
            BucketStore.read(spark, cfg.target).getOrElse(admitted)
          else admitted
        BucketStore.merge(
          Dedup.lshBands(bandSrc, "sig", cfg.bands, cfg.rows, "doc_id")
            .withColumn("net_op", lit("insert")),
          cfg.bandTarget, Seq("doc_id", "band"), cfg.nBuckets, batchId)
        n
      } finally admitted.unpersist()
    } finally sig.unpersist() // also on failure: a retrying stream must
                              // not accumulate orphaned cached batches
  }

  /** Drive [[admitBatch]] over an unbounded (doc_id, text) stream. */
  def admissionStream(newDocs: DataFrame, cfg: Config,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", cfg.checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        admitBatch(batch, cfg, id); ()
      }
      .start()
}
