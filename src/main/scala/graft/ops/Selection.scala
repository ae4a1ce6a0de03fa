package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection toward a target distribution — hashed-n-gram
  * importance resampling in the DSIR family (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): estimate bag-of-hashed-n-gram distributions for
  * the target exemplars and the raw corpus, score every raw doc by how
  * much more likely its grams are under the target, keep the top
  * scorers. This is the op between language-ID/quality filtering and
  * mixing: the former drop bad docs, this one PULLS the corpus toward a
  * distribution you have exemplars of.
  *
  * Scale shape (the reason for the two-pass design):
  *   1. histogram pass — explode grams, ONE map-side-combined aggregate
  *      onto `buckets` keys (the shuffle carries ≤ buckets rows per
  *      map partition, regardless of corpus size);
  *   2. weight table — ≤ `buckets` rows of bounded metadata, computed
  *      driver-side and re-shipped as a LITERAL array (the
  *      seedCentroids idiom), so
  *   3. scoring pass — explode + the codegen'd bucket hash + ONE
  *      doc-keyed map-side-combined INTEGER sum against the literal
  *      weight array: no join, no broadcast handshake, and the only
  *      exchange carries one narrow (id, long, long) row per doc.
  *      Selection itself is a TakeOrdered (`orderBy.limit(k)`), never
  *      a full sort. (A per-doc `aggregate` HOF fold would be
  *      exchange-free but runs INTERPRETED — lambda bodies are
  *      CodegenFallback — and measured ~8× slower; the narrow
  *      doc-keyed agg is the retention-reshape trade.)
  * Two corpus scans are inherent to the method (the raw histogram is
  * the denominator of every weight); nothing is cached between them —
  * at corpus scale a cache barrier would be a spill, not a save.
  *
  * Portability contract (the gate hash-compares against DuckDB): the
  * fixed-point weights use only exactly-rounded IEEE ops in a pinned
  * association — w(b) = floor(((tc+1)·Rp / ((rc+1)·Tp)) · S) − S, with
  * Rp = R + buckets and Tp = T + buckets the add-one-smoothed gram
  * totals — and every per-doc score is an INTEGER sum of those
  * weights, so summation order cannot matter. The true log-likelihood-
  * ratio form (the paper's score) is available via [[dsirLogScores]]
  * for production; it is not gated because libm `ln` is not
  * bit-pinned across engines. The centered ratio weight keeps the
  * log form's sign structure (under-represented-in-target grams score
  * negative), so score is evidence, not length. Sign is meaningful in
  * the corpus regime — gram totals ≫ `buckets`, so the add-one
  * smoothing mass is negligible; on toy inputs the smoothing shifts
  * the neutral point (SelectionSpec builds its fixture long for this
  * reason). Ranking is monotone-stable either way, and selection is
  * rank-based.
  */
object Selection {

  /** The gram array for one doc: unigrams + bigrams of the whitespace
    * tokens. Bigrams pair each token with its successor via zip_with
    * against the 1-shifted array (the null-padded tail pair
    * concat-nulls out and is filtered) — no per-element
    * `element_at(toks, i)` indexing, so the token-split subtree is
    * referenced a CONSTANT number of times per row (~4), not once per
    * gram (the projection-collapse fan-out the shingle family needs
    * cache barriers against). Lambda bodies here are cheap string
    * concat only: HOF lambdas run INTERPRETED (CodegenFallback), so
    * the md5 bucket hash deliberately lives in the codegen'd
    * post-explode projection ([[bucketOf]]), not in a lambda —
    * measured 117s → 38s on the ×100 probe corpus (SCALEPROBE_r19). */
  def grams(textCol: Column): Column = {
    val toks = TextAnalysis.tokens(textCol)
    val bigrams = filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y)),
      g => g.isNotNull)
    concat(toks, bigrams)
  }

  /** md5-sliced bucket of one (exploded) gram: whole-stage-codegen'd. */
  def bucketOf(gram: Column, buckets: Int): Column =
    pmod(Mixing.hashSlice(gram), lit(buckets)).cast("int")

  /** Back-compat shape of the per-doc bucket array (specs exercise the
    * array form; the scoring passes explode instead — see [[grams]]). */
  def gramBuckets(textCol: Column, buckets: Int): Column =
    transform(grams(textCol), g => bucketOf(g, buckets))

  /** The smoothed, centered, fixed-point bucket weight. EXACTLY this
    * association on both engines: ((tc+1)·Rp / ((rc+1)·Tp)) · S,
    * floored. All inputs are exact in double (counts ≤ 2^53 per
    * bucket); each ·,/ is a single correctly-rounded IEEE op, so the
    * double is bit-identical everywhere. */
  private def weightOf(tc: Long, rc: Long, rp: Double, tp: Double,
      scale: Long): Long =
    math.floor((tc + 1.0) * rp / ((rc + 1.0) * tp) * scale).toLong - scale

  /** The histogram pass: per-bucket (raw count, target count) plus the
    * smoothed totals (Rp, Tp). ≤ `buckets` rows collected — bounded
    * metadata, the one eager action of the op. */
  private def histogram(corpus: DataFrame, targetPred: Column,
      textCol: String, buckets: Int)
      : (Array[org.apache.spark.sql.Row], Double, Double) = {
    val hist = corpus
      .select(targetPred.as("_t"), explode(grams(col(textCol))).as("_g"))
      .select(col("_t"), bucketOf(col("_g"), buckets).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("rc"),
        sum(when(col("_t"), 1L).otherwise(0L)).as("tc"))
      .collect() // ≤buckets rows: bounded by construction
    val rp = (hist.map(_.getLong(1)).sum + buckets).toDouble
    val tp = (hist.map(_.getLong(2)).sum + buckets).toDouble
    (hist, rp, tp)
  }

  /** Per-bucket (raw, target) gram counts → the dense literal weight
    * array. */
  private def weightArray(corpus: DataFrame, targetPred: Column,
      textCol: String, buckets: Int, scale: Long): IndexedSeq[Long] = {
    val (hist, rp, tp) = histogram(corpus, targetPred, textCol, buckets)
    val w = Array.fill(buckets)(weightOf(0L, 0L, rp, tp, scale))
    hist.foreach { row =>
      w(row.getInt(0)) = weightOf(row.getLong(2), row.getLong(1), rp, tp, scale)
    }
    w.toIndexedSeq
  }

  /** The scoring pass: explode, codegen bucket hash, one doc-keyed
    * map-side-combined sum of the literal weight lookup. `warr` is the
    * already-built literal weight-array column. */
  private def scoreWith(corpus: DataFrame, idCol: String, textCol: String,
      buckets: Int, warr: Column, scoreName: String): DataFrame =
    corpus.select(col(idCol), explode(grams(col(textCol))).as("_g"))
      .select(col(idCol), bucketOf(col("_g"), buckets).as("_b"))
      .groupBy(col(idCol))
      .agg(sum(element_at(warr, col("_b") + 1)).as(scoreName),
        count(lit(1)).as("n_grams"))

  /** Importance score for every corpus doc: (idCol, score, n_grams)
    * with score = Σ over the doc's grams of the centered fixed-point
    * weight (BIGINT — positive ⇔ the doc's grams are over-represented
    * in the target relative to the corpus). `targetPred` marks the
    * target exemplars (e.g. `col("lang") === "en"`); they are scored
    * too, like every other doc. After the histogram pass the scoring
    * exchange carries one narrow row per doc. */
  def dsirScores(corpus: DataFrame, targetPred: Column, idCol: String,
      textCol: String, buckets: Int = 1024,
      scale: Long = 1000000L): DataFrame = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in [1, 65536] — the md5 slice is 16-bit (got $buckets)")
    require(scale > 0, s"scale must be positive (got $scale)")
    val warr = weightArray(corpus, targetPred, textCol, buckets, scale)
    scoreWith(corpus, idCol, textCol, buckets, typedlit(warr), "score")
  }

  /** Top-`k` selection by importance score (score desc, id asc — the
    * deterministic "top-k" variant of the paper's Gumbel resampling):
    * (idCol, score, n_grams, rank). The global top-k is a TakeOrdered;
    * the rank window runs on k rows. */
  def dsirSelect(corpus: DataFrame, targetPred: Column, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024,
      scale: Long = 1000000L): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val spark = corpus.sparkSession
    val top = dsirScores(corpus, targetPred, idCol, textCol, buckets, scale)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
    // ≤k rows, already in TakeOrdered order — assign ranks driver-side
    // and re-ship as a literal relation (the seedCentroids idiom; a
    // global row_number window would be a needless single-partition
    // exchange and a standing "No Partition Defined" scale smell)
    val ranked = top.collect().toSeq.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1).toLong)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(ranked: _*),
      top.schema.add("rank", org.apache.spark.sql.types.LongType,
        nullable = false))
  }

  /** The paper's actual score — Σ ln((tc+1)·Rp / ((rc+1)·Tp)) — for
    * production selection (thresholding, Gumbel-noised resampling).
    * Same two-pass shape; Double score. NOT oracle-gated: libm ln is
    * not bit-pinned across engines (the fixed-point ratio form above
    * is the gated twin and preserves the sign structure). */
  def dsirLogScores(corpus: DataFrame, targetPred: Column, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in [1, 65536] — the md5 slice is 16-bit (got $buckets)")
    // the same integer histogram; weights as ln of the same smoothed ratio
    val (hist, rp, tp) = histogram(corpus, targetPred, textCol, buckets)
    val w = Array.fill(buckets)(math.log(rp / tp))
    hist.foreach { row =>
      w(row.getInt(0)) = math.log(
        (row.getLong(2) + 1.0) * rp / ((row.getLong(1) + 1.0) * tp))
    }
    scoreWith(corpus, idCol, textCol, buckets, typedlit(w.toIndexedSeq),
      "log_score")
  }

  /** The weight table as a persistable DataFrame — DENSE: one row per
    * bucket in [0, buckets), unseen buckets carrying the smoothed
    * default, so the table is self-contained (no side-channel totals
    * needed to apply it). This is the train-once/apply-forever seam:
    * fit on the reference corpus, write the ≤65536-row table next to
    * the release manifest, and score every future increment or stream
    * micro-batch against it with [[scoreAgainst]] — incremental
    * admission decisions stay stable because the weights are frozen,
    * the same contract the IVF store keeps for its coarse quantizer. */
  def fitWeights(corpus: DataFrame, targetPred: Column, textCol: String,
      buckets: Int = 1024, scale: Long = 1000000L): DataFrame = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in [1, 65536] — the md5 slice is 16-bit (got $buckets)")
    require(scale > 0, s"scale must be positive (got $scale)")
    val spark = corpus.sparkSession
    import spark.implicits._
    weightArray(corpus, targetPred, textCol, buckets, scale)
      .zipWithIndex.map { case (w, b) => (b, w) }
      .toDF("bucket", "w")
  }

  /** Score `df` against a FROZEN [[fitWeights]] table (any frame with
    * dense (bucket, w) rows — typically read back from storage). The
    * table is bounded metadata: collected and re-shipped as the same
    * literal array the fit-time scorer uses, so a corpus scored via
    * fit-then-apply equals [[dsirScores]] exactly (spec-pinned), and
    * new data never shifts old scores. */
  def scoreAgainst(df: DataFrame, weights: DataFrame, idCol: String,
      textCol: String, scoreName: String = "score"): DataFrame =
    frozenScorer(weights, idCol, textCol, scoreName)(df)

  /** The reusable half of [[scoreAgainst]]: validate and collect the
    * frozen weights table ONCE, return a per-frame scoring function —
    * the streaming form, where one collect at query construction scores
    * every micro-batch (collecting per batch would re-read the table on
    * each trigger). The collect is pre-bounded to the contract maximum
    * + 1 row, so a wrong weightsPath (an accidentally-huge frame) fails
    * the require without first being pulled to the driver in full. */
  def frozenScorer(weights: DataFrame, idCol: String, textCol: String,
      scoreName: String = "score"): DataFrame => DataFrame = {
    val rows = weights.select(col("bucket").cast("int"),
      col("w").cast("long")).limit(65537).collect()
    val buckets = rows.length
    require(buckets > 0 && buckets <= 65536,
      s"weights table must have 1..65536 dense rows (got $buckets)")
    val warr = Array.ofDim[Long](buckets)
    val seen = Array.ofDim[Boolean](buckets)
    rows.foreach { r =>
      val b = r.getInt(0)
      require(b >= 0 && b < buckets,
        s"weights table is not dense: bucket $b outside [0, $buckets)")
      warr(b) = r.getLong(1); seen(b) = true
    }
    require(seen.forall(identity),
      "weights table is not dense: missing buckets")
    val lit = typedlit(warr.toIndexedSeq)
    df => scoreWith(df, idCol, textCol, buckets, lit, scoreName)
  }

  /** The paper's resampling selection: top-k of `log_score/temperature
    * + Gumbel(id)` — sampling-without-replacement ∝ w^(1/T) by the
    * Gumbel-top-k identity, with the noise derived from the md5 hash
    * slice of the id instead of RNG state, so the draw is reproducible
    * cluster-wide and stable across reruns/backfills (the Mixing-family
    * determinism contract; u = (slice + 0.5)/65536 keeps the ln
    * arguments strictly inside (0, 1)). T → 0 degenerates to
    * [[dsirSelect]]'s argmax behavior; T = 1 is the paper's draw.
    * Production form (libm, ungated), same two-pass scale shape. */
  def dsirResample(corpus: DataFrame, targetPred: Column, idCol: String,
      textCol: String, k: Int, temperature: Double = 1.0,
      buckets: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    require(temperature > 0.0,
      s"temperature must be positive (got $temperature)")
    val u = (Mixing.hashSlice(col(idCol)).cast("double") + 0.5) / 65536.0
    val gumbel = -log(-log(u))
    dsirLogScores(corpus, targetPred, idCol, textCol, buckets)
      .withColumn("key", col("log_score") / temperature + gumbel)
      .orderBy(col("key").desc, col(idCol).asc)
      .limit(k)
  }
}
