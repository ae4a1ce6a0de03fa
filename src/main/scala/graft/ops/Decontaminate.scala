package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the corpus-hygiene pass every training
  * pipeline runs before a data release: find (and drop) training docs
  * that share verbatim word n-grams with an evaluation/benchmark set,
  * so eval scores measure generalization rather than memorized leakage.
  *
  * Scale design: the BENCHMARK side is small (eval suites are
  * KBs–MBs), so its distinct n-gram set broadcasts; the corpus side is
  * a map-only shingle explode feeding a broadcast semi/inner join — the
  * 100 TB corpus is never shuffled. Exact n-gram collision (not
  * similarity) is the standard decontamination criterion: one shared
  * n-gram of the chosen length is already leakage.
  */
object Decontaminate {

  /** Distinct word n-grams per doc: (idCol, ng). */
  private def grams(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol),
        explode(array_distinct(Dedup.shingles(col("toks"), n))).as("ng"))

  /** Contaminated docs: corpus docs sharing ≥1 n-gram with `bench`,
    * with the distinct-collision count per doc (the audit artifact —
    * high counts are near-copies, low counts boilerplate overlap). */
  def contaminated(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    grams(corpus, idCol, textCol, n)
      .join(broadcast(grams(bench, idCol, textCol, n)
        .select("ng").distinct()), "ng")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))

  /** [[contaminated]] with a bloom prefilter on the corpus gram stream —
    * the form for when the benchmark gram set outgrows a comfortable
    * broadcast (a full eval-suite union is GBs of distinct grams; at
    * ~10 bits/gram the bloom is MBs).
    *
    * Exactness is preserved by construction: the bloom admits every true
    * benchmark gram (no false negatives), and survivors are confirmed by
    * the same exact join as [[contaminated]] — false positives only cost
    * verify work on the (tiny) hit stream. So the output is IDENTICAL to
    * [[contaminated]] and shares its oracle. Scale shape: the corpus side
    * stays a map-only explode + codegen'd bit probe (never shuffled, and
    * with ~1% fpp ~99% of grams die before the join); the verify join's
    * build side is the benchmark gram set as before, but the probe side
    * has shrunk from |corpus grams| to |hits| ≈ |true collisions|, so at
    * bench sets too big to broadcast a shuffle join is cheap — it only
    * moves the hits. The bits build is a distributed OR-fold
    * ([[graft.functions.Bloom64.BloomAgg]]): one m/8-byte value reaches
    * the driver regardless of benchmark size. */
  def contaminatedBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    val benchNg = grams(bench, idCol, textCol, n).select("ng").distinct().cache()
    val bits = graft.functions.Bloom64.build(
      benchNg.select(graft.functions.Fnv64.of(col("ng")).as("h")), mBits, k)
    val hits = grams(corpus, idCol, textCol, n)
      .filter(graft.functions.Bloom64.of(
        lit(bits), graft.functions.Fnv64.of(col("ng")), k))
    hits.join(benchNg, "ng")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
  }

  /** The scrub: corpus minus contaminated docs (anti-join on the
    * broadcast collision set). */
  def scrub(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    corpus.join(contaminated(corpus, bench, idCol, textCol, n),
      Seq(idCol), "left_anti")
}
