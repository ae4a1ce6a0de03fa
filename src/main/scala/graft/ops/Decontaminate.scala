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

  /** The scrub: corpus minus contaminated docs (anti-join on the
    * broadcast collision set). */
  def scrub(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    corpus.join(contaminated(corpus, bench, idCol, textCol, n),
      Seq(idCol), "left_anti")
}
