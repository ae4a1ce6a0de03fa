package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches
import graft.queries.Registry

/** Mergeable-sketch semantics: idempotent union under re-delivery (the
  * property exact per-batch counts lack), merge ≡ single-pass, and the
  * in-engine error flags the gated queries rely on. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 2000L).toDF("id")
    .select(col("id"), (col("id") % 4).cast("string").as("grp"),
      // 500 distinct values per group, each delivered twice
      md5((col("id") % 1000).cast("string")).as("v"))

  test("hll union is idempotent: re-appending the same batch changes nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sketch-idem")
    try {
      val batch = Sketches.sketchBatch(corpus, "grp", "v", batchId = 0L)
      Sketches.appendSketches(s"$tmp/st", batch)
      val once = Sketches.mergedDistinct(spark, s"$tmp/st", "grp")
        .select("grp", "merged_est").as[(String, Double)].collect().toMap
      // redeliver the identical batch twice more (at-least-once delivery)
      Sketches.appendSketches(s"$tmp/st", batch.withColumn("batch_id", lit(1L)))
      Sketches.appendSketches(s"$tmp/st", batch.withColumn("batch_id", lit(2L)))
      val thrice = Sketches.mergedDistinct(spark, s"$tmp/st", "grp")
        .select("grp", "merged_est").as[(String, Double)].collect().toMap
      assert(once == thrice, s"re-delivered batch moved the estimate: $once vs $thrice")
    } finally Registry.rmTree(tmp.toFile)
  }

  test("merged slice sketches estimate the union within tolerance of exact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sketch-merge")
    try {
      // overlapping halves: id%2=0 and id%3=0 share every 6th id
      Sketches.appendSketches(s"$tmp/st",
        Sketches.sketchBatch(corpus.filter(col("id") % 2 === 0), "grp", "v", 0L))
      Sketches.appendSketches(s"$tmp/st",
        Sketches.sketchBatch(corpus.filter(col("id") % 3 === 0), "grp", "v", 1L))
      val merged = Sketches.mergedDistinct(spark, s"$tmp/st", "grp")
        .select("grp", "merged_est", "n_batches")
        .as[(String, Double, Long)].collect()
      val exact = corpus.filter(col("id") % 2 === 0 || col("id") % 3 === 0)
        .groupBy("grp").agg(countDistinct(col("v")).as("d"))
        .as[(String, Long)].collect().toMap
      // even groups (0, 2) appear in both slices; odd only in id%3=0
      val wantBatches = Map("0" -> 2L, "1" -> 1L, "2" -> 2L, "3" -> 1L)
      assert(merged.length == 4)
      merged.foreach { case (g, est, nb) =>
        assert(nb == wantBatches(g), s"group $g: batches $nb")
        assert(math.abs(est - exact(g)) <= exact(g) * 0.05,
          s"group $g: est $est vs exact ${exact(g)}")
      }
    } finally Registry.rmTree(tmp.toFile)
  }

  test("distinctProfile and quantileProfile flags hold; exact legs match a model") {
    val prof = Sketches.distinctProfile(corpus, "grp", "v")
      .select("grp", "n_rows", "exact_distinct", "est_ok")
      .as[(String, Long, Long, Boolean)].collect()
    assert(prof.length == 4)
    prof.foreach { case (g, n, d, ok) =>
      assert(n == 500 && d == 250 && ok, s"group $g: n=$n d=$d ok=$ok")
    }
    val q = Sketches.quantileProfile(
      (1L to 101L).toDF("v").withColumn("g", lit("x")), "g", "v")
      .select("g", "q25", "q50", "q75", "approx_ok")
      .as[(String, Double, Double, Double, Boolean)].collect()
    assert(q.toSeq == Seq(("x", 26.0, 51.0, 76.0, true)), q.mkString(","))
  }

  test("overlapEstimate: inclusion-exclusion lands near the exact intersection") {
    // A = v in [0, 600), B = v in [400, 1000) → exact overlap 200 of
    // union 1000; tolerance is a fraction of the UNION (each HLL leg's
    // error scales with its own cardinality, not the overlap's)
    val all = (0L until 1000L).toDF("v").select(md5(col("v").cast("string")).as("id"),
      col("v"))
    val est = Sketches.overlapEstimate(
      all.filter(col("v") < 600), all.filter(col("v") >= 400), "id")
      .select("est_a", "est_b", "est_union", "est_overlap")
      .as[(Double, Double, Double, Double)].head()
    assert(math.abs(est._1 - 600) <= 600 * 0.05)
    assert(math.abs(est._2 - 600) <= 600 * 0.05)
    assert(math.abs(est._3 - 1000) <= 1000 * 0.05)
    assert(math.abs(est._4 - 200) <= 1000 * 0.05 + 1,
      s"overlap estimate ${est._4} vs exact 200")
  }

  test("heavyHitters surfaces the hot key first with a sound one-sided bound") {
    // 30% of 10k rows on key 7, the rest spread over 1k keys
    val skewed = (0L until 10000L).toDF("id")
      .select(when(col("id") % 10 < 3, lit(7L))
        .otherwise(pmod(xxhash64(col("id")), lit(1000)) + 100).as("k"))
    val hh = Sketches.heavyHitters(skewed, "k", topK = 5)
      .select("k", "exact_cnt", "cms_ok")
      .as[(Long, Long, Boolean)].collect()
    assert(hh.length == 5)
    assert(hh.head._1 == 7L && hh.head._2 == 3000L,
      s"hot key not first: ${hh.toSeq}")
    assert(hh.forall(_._3), s"CMS bound violated: ${hh.toSeq}")
    // hottest first, ordered
    assert(hh.map(_._2).toSeq == hh.map(_._2).sortBy(-_).toSeq)
  }

  test("sketchBatch aggregates map-side (partial objecthash agg, no sort agg)") {
    val plan = Sketches.sketchBatch(corpus, "grp", "v", 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"),
      s"sketch aggregation fell out of the hash path:\n$plan")
  }
}
