package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: the ANN OPERATING CURVE — recall@k vs wall time vs
  * shuffle bytes across nprobe × representation, against the exact
  * brute-force ground truth. `ann_recall` gates ONE point (IVF full
  * precision, nprobe=4); a 100-TB deployment picks its serving default
  * from the frontier, so the frontier has to exist as a measured
  * artifact, not an assumption: more probes buy recall linearly in
  * scanned postings; narrower representations (int8, PQ codes) buy
  * shuffle width at a recall cost that only the curve can price.
  *
  * Variants:
  *   - ivf    — cell-pruned serve over the full double vectors
  *   - q8     — int8-quantized corpus (≈6× narrower candidate shuffle)
  *   - pq_mM  — IVF+PQ with M subspaces (codes-only candidates; ranks
  *              by ADC L2, so recall vs the cosine truth prices the
  *              metric mismatch too, exactly as a deployment would)
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.AnnCurve"
  */
object AnnCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val topK = 5
    val spark = Sessions.local(cpus, appName = "graft-anncurve")
    import graft.ops.Similarity

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    emb.count()
    val q32 = emb.filter(col("vec_id") < 32)

    // exact ground truth: one bounded collect (|queries| × k rows)
    val truth = Similarity.bruteTopK(emb, q32, topK)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def shuffledBytes(f: => Unit): Long = ProbeUtil.shuffledBytes(spark)(f)

    def recallOf(res: DataFrame): Double = {
      val got = res.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }

    val variants: Seq[(String, Int => DataFrame)] = Seq(
      "ivf" -> (np => Similarity.ivfTopK(emb, q32, topK, cells = 16, nprobe = np)),
      "q8" -> (np => Similarity.ivfTopKQ8(emb, q32, topK, cells = 16, nprobe = np)),
      "pq_m2" -> (np => Similarity.ivfPqTopK(emb, q32, topK, cells = 16,
        nprobe = np, m = 2, k = 8)),
      "pq_m4" -> (np => Similarity.ivfPqTopK(emb, q32, topK, cells = 16,
        nprobe = np, m = 4, k = 8)),
      "pq_m8" -> (np => Similarity.ivfPqTopK(emb, q32, topK, cells = 16,
        nprobe = np, m = 8, k = 8)),
      // larger code budgets (8 bits/subspace, then 16 subspaces):
      // the synthetic fixture's embeddings are high-entropy, the worst
      // case for PQ — these points price how much budget buys back
      "pq_m8k64" -> (np => Similarity.ivfPqTopK(emb, q32, topK, cells = 16,
        nprobe = np, m = 8, k = 64, pqIters = 3)),
      "pq_m16k16" -> (np => Similarity.ivfPqTopK(emb, q32, topK, cells = 16,
        nprobe = np, m = 16, k = 16, pqIters = 3)))

    variants.foreach { case (name, mk) =>
      mk(4).write.mode("overwrite").format("noop").save() // warm per variant
      Seq(1, 2, 4, 8, 16).foreach { np =>
        val t0 = System.nanoTime()
        val bytes = shuffledBytes(
          mk(np).write.mode("overwrite").format("noop").save())
        val secs = (System.nanoTime() - t0) / 1e9 - 1.5 // minus listener drain
        val rec = recallOf(mk(np))
        println(s"""{"probe":"ann_curve","variant":"$name","nprobe":$np,""" +
          f""""recall_at_$topK":$rec%.4f,"secs":$secs%.3f,""" +
          s""""shuffle_bytes":$bytes,"cells":16,"queries":32,"sf":"$sfDir"}""")
      }
    }
    spark.stop()
  }
}
