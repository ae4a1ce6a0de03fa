package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators: distinct counting and quantiles that an
  * incremental 100-TB pipeline can afford.
  *
  * The scale problem these solve: `COUNT(DISTINCT x)` over a growing
  * corpus re-shuffles every ingested row on every refresh, and a
  * quantile needs a global sort. Sketches replace both with a bounded
  * per-partition state (a few KB) that merges associatively — per-batch
  * sketches persist to a store the size of (groups × batches) rows, and
  * a refresh reads ONLY the sketch store, never the corpus. Spark ships
  * the Apache DataSketches HLL family as codegen'd aggregates
  * (`hll_sketch_agg` / `hll_union_agg`), so the whole path stays inside
  * whole-stage codegen with no UDFs.
  *
  * Estimates are approximate, so gated queries verify them IN-ENGINE
  * against the exact aggregate on the same data (the `ann_recall`
  * pattern): the oracle-checked columns are the exact counts, and the
  * sketch legs must land within `relTol` of them to emit `true` flags.
  */
object Sketches {

  /** Per-group distinct-count profile: exact and HLL(lgK) in one plan.
    * The exact leg exists to VERIFY the estimate (and for the gate); a
    * production profile at 100 TB drops it and keeps only the sketch,
    * which aggregates map-side into 2^lgK registers per group instead
    * of shuffling every distinct value.
    *
    * Output: grp, n_rows, exact_distinct, est_ok (estimate within
    * relTol of exact — lgK=12 has ~1.6% relative standard error, so
    * the default 5% gate is ~3 sigma).
    */
  def distinctProfile(df: DataFrame, grpCol: String, idCol: String,
      lgK: Int = 12, relTol: Double = 0.05): DataFrame =
    df.groupBy(grpCol)
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col(idCol)).cast("long").as("exact_distinct"),
        hll_sketch_estimate(hll_sketch_agg(col(idCol), lgK)).as("_est"))
      .withColumn("est_ok",
        abs(col("_est") - col("exact_distinct")) <=
          col("exact_distinct") * relTol)
      .drop("_est")

  /** One batch's per-group sketch state: (grp, batch_id, n_rows,
    * sketch). A few KB per group regardless of batch size — this is
    * the row an incremental pipeline persists instead of the corpus. */
  def sketchBatch(df: DataFrame, grpCol: String, idCol: String,
      batchId: Long, lgK: Int = 12): DataFrame =
    df.groupBy(grpCol)
      .agg(count(lit(1)).cast("long").as("n_rows"),
        hll_sketch_agg(col(idCol), lgK).as("sketch"))
      .withColumn("batch_id", lit(batchId))

  /** Append one batch's sketches to a parquet sketch store. The store
    * grows by |groups| rows per batch — merge cost is independent of
    * corpus size, which is the whole point. */
  def appendSketches(store: String, batch: DataFrame): Unit =
    batch.write.mode("append").parquet(store)

  /** Merged distinct estimate across every persisted batch sketch.
    * HLL union is a per-register max — associative, commutative, and
    * idempotent, so overlapping or re-delivered batches cannot
    * double-count (the property exact per-batch counts lack). Reads
    * the sketch store only; the corpus is never touched. */
  def mergedDistinct(spark: SparkSession, store: String,
      grpCol: String): DataFrame =
    spark.read.parquet(store)
      .groupBy(grpCol)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("merged_est"),
        countDistinct(col("batch_id")).cast("long").as("n_batches"))

  /** Cross-corpus overlap estimate WITHOUT a join: |A∩B| by
    * inclusion-exclusion over three HLL legs — est(A) + est(B) −
    * est(A∪B), where the union leg is the scalar `hll_union` of the two
    * sides' sketches. Each corpus collapses map-side to ONE sketch row;
    * no row of either corpus ever moves, which at 100 TB replaces the
    * join-based overlap (two full shuffles) with two scans and a
    * constant-size merge. Error grows with |A∪B| (each leg carries
    * lgK's relative standard error of its own cardinality), so the
    * caller-facing tolerance is a fraction of the UNION estimate — the
    * honest bound — not of the overlap itself.
    *
    * Output (1 row): est_a, est_b, est_union, est_overlap (doubles). */
  def overlapEstimate(a: DataFrame, b: DataFrame, idCol: String,
      lgK: Int = 14): DataFrame = {
    def one(df: DataFrame, n: String) =
      df.agg(hll_sketch_agg(col(idCol), lgK).as(s"sk_$n"))
    one(a, "a").crossJoin(one(b, "b"))
      .select(
        hll_sketch_estimate(col("sk_a")).as("est_a"),
        hll_sketch_estimate(col("sk_b")).as("est_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .as("est_union"))
      .withColumn("est_overlap",
        col("est_a") + col("est_b") - col("est_union"))
  }

  /** Heavy-hitter profile via count-min sketch: the hot-key DETECTOR.
    * Every skew mitigation in this engine (salted aggs, AQE split,
    * capPerKey) presumes you know which keys are hot; at 100 TB the
    * exact answer (a full groupBy) is itself a corpus shuffle. The CMS
    * leg here is ONE scan with NO shuffle: each partition folds into a
    * depth×width counter grid (~160 KB at the defaults), grids merge
    * by cell-wise add into a single binary on the driver, and any
    * candidate key's count reads off the grid with a one-sided error
    * bound — est ≥ exact always, est ≤ exact + ⌈eps·N⌉ with prob.
    * `confidence`. Candidates here are the exact top-K (the
    * verification leg the gate checks); a production pass feeds the
    * grid last round's hitters or a per-partition candidate heap.
    * NULL keys are excluded up front: the SQL count_min_sketch
    * aggregate skips them, so counting them on the exact leg (or
    * probing the grid with null) would be wrong by construction.
    *
    * Output (topK rows, hottest first): key, exact_cnt, cms_ok. */
  def heavyHitters(in: DataFrame, keyCol: String, topK: Int,
      eps: Double = 0.0005, confidence: Double = 0.99, seed: Int = 42)
      : DataFrame = {
    val df = in.filter(col(keyCol).isNotNull)
    val bin = df.agg(count_min_sketch(col(keyCol), lit(eps),
      lit(confidence), lit(seed)).as("cms")).head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bin))
    val cap = math.ceil(eps * cms.totalCount()).toLong
    val exact = df.groupBy(keyCol)
      .agg(count(lit(1)).cast("long").as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(keyCol))
      .limit(topK)
    val rows = exact.collect().map { r =>
      val est = cms.estimateCount(r.get(0))
      val cnt = r.getLong(1)
      org.apache.spark.sql.Row(r.get(0), cnt, est >= cnt && est <= cnt + cap)
    }
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(exact.schema.fields :+
        org.apache.spark.sql.types.StructField("cms_ok",
          org.apache.spark.sql.types.BooleanType, nullable = false)))
  }

  /** Per-group quantile profile: exact interpolated percentiles (the
    * oracle-checked values) plus the GK-sketch approximation's error
    * flag. At 100 TB only the approx leg survives: percentile_approx
    * keeps an accuracy-bounded summary per partition and merges, where
    * exact percentile sorts every value of the group. */
  def quantileProfile(df: DataFrame, grpCol: String, valCol: String,
      accuracy: Int = 10000, relTol: Double = 0.05): DataFrame = {
    val v = col(valCol)
    df.groupBy(grpCol)
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        percentile(v, array(lit(0.25), lit(0.5), lit(0.75))).as("_ex"),
        percentile_approx(v, array(lit(0.25), lit(0.5), lit(0.75)),
          lit(accuracy)).as("_ap"))
      .select(col(grpCol), col("n_rows"),
        col("_ex").getItem(0).as("q25"),
        col("_ex").getItem(1).as("q50"),
        col("_ex").getItem(2).as("q75"),
        // approx returns an actual element; exact interpolates — compare
        // against a tolerance scaled by the inter-quartile spread (+1 so
        // a zero-width distribution still admits the element it contains)
        (abs(col("_ap").getItem(1).cast("double") - col("_ex").getItem(1)) <=
          (col("_ex").getItem(2) - col("_ex").getItem(0) + lit(1.0)) * relTol)
          .as("approx_ok"))
  }
}
