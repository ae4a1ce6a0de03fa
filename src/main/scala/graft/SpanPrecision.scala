package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: the span-dedup PRECISION trade, measured. Fixed-width and
  * content-defined chunking approximate exact substring dedup
  * ([[ops.Dedup.exactSpanCover]] — token-granular, stride-1, no
  * boundary quantization) at 1/L the gram rows; this probe quantifies
  * what the approximation costs, per chunker, as:
  *
  *   - recall = |removed ∩ exact-cover| / |exact-cover| — how much of
  *     the genuinely duplicated text the chunker actually removes;
  *   - over-removal = |removed \ exact-cover| / |removed| — text the
  *     chunker cut that the exact method would keep (chunkers only
  *     remove content-identical whole chunks, so this should be ~0 —
  *     their failure mode is under-removal, not over-removal).
  *
  * Two corpora:
  *   1. the sf fixture as-is (organic duplication);
  *   2. a PLANTED corpus: every doc's tokens salted doc-unique, then a
  *      fixed 24-token passage inserted into doc pairs at offsets
  *      varied mod 8 — the construction that separates the chunkers:
  *      fixed-8 chunks only match when both plant offsets agree mod 8
  *      (the interior chunks land on the same 8-token frames), while
  *      CDC boundaries re-synchronize on content within ~one mean
  *      chunk length of the plant edge, whatever the offsets.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.SpanPrecision"
  */
object SpanPrecision {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, appName = "graft-spanprecision")
    import graft.ops.Dedup

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")

    /** Score one chunker's removed-position frame against the exact
      * cover (both keyed (doc_id, _p)). */
    def score(cover: DataFrame, removed: DataFrame): (Long, Long, Long) = {
      val c = cover.filter(col("_covered")).select(col("doc_id"), col("_p"))
      val r = removed.select(col("doc_id"), col("_p"))
      val coverN = c.count()
      val hit = r.join(c, Seq("doc_id", "_p"), "left_semi").count()
      val over = r.join(c, Seq("doc_id", "_p"), "left_anti").count()
      (coverN, hit, over)
    }

    def report(tag: String, corpus: DataFrame): Unit = {
      val cover = Dedup.exactTokenCover(corpus, "doc_id", "text", 8)
        .localCheckpoint(true)
      Seq(
        "fixed8" -> Dedup.chunkTokenRemoved(corpus, "doc_id", "text", 8),
        "cdc01" -> Dedup.cdcTokenRemoved(corpus, "doc_id", "text", "01"),
        // the short-segment guard: a dup CDC segment under 4 tokens is
        // kept — variable-length segments otherwise remove sub-L
        // fragments the exact method would keep
        "cdc01_min4" -> Dedup.cdcTokenRemoved(corpus, "doc_id", "text", "01",
          minRemoveTokens = 4)
      ).foreach { case (chunker, removed) =>
        val (coverN, hit, over) = score(cover, removed)
        val removedN = hit + over
        println(s"""{"probe":"span_precision","corpus":"$tag",""" +
          s""""chunker":"$chunker","exact_cover":$coverN,""" +
          s""""removed":$removedN,"hit":$hit,"over_removed":$over,""" +
          f""""recall":${if (coverN == 0) 1.0 else hit.toDouble / coverN}%.4f,""" +
          f""""over_frac":${if (removedN == 0) 0.0 else over.toDouble / removedN}%.4f,""" +
          s""""sf":"$sfDir"}""")
      }
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
    }

    // corpus 1: the fixture as-is
    report("fixture", docs)

    // corpus 2: planted passages at varied offsets. Base docs are
    // token-salted doc-unique (no organic dups survive the salt), then
    // doc pairs (2i, 2i+1) both receive the same 24-token passage —
    // pair i's passage is unique to the pair. Doc 2i plants at offset
    // 4; doc 2i+1 at offset 4 + (i mod 8): exactly 1 pair in 8 is
    // 8-aligned, the alignment the fixed chunker needs, while CDC's
    // content-defined cuts re-synchronize at any offset.
    val salted = docs
      .withColumn("text", regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1u"), col("doc_id").cast("string"))))
    val pairId = floor(col("doc_id") / 2)
    val passage = concat_ws(" ",
      (1 to 24).map(i => concat(lit(s"p$i"), pairId.cast("string"))): _*)
    val toksArr = graft.ops.TextAnalysis.tokens(col("text"))
    val off = (lit(4) + (col("doc_id") % 2) * (pairId % 8)).cast("int")
    val planted = salted.withColumn("text",
      concat_ws(" ",
        concat_ws(" ", slice(toksArr, lit(1), off)),
        passage,
        concat_ws(" ", slice(toksArr, off + 1, lit(1 << 20)))))
    report("planted24", planted)

    spark.stop()
  }
}
