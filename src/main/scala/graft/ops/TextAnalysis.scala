package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, token counting, and
  * document fingerprinting.
  *
  * All operators are single-pass column expressions (higher-order
  * functions, no UDFs, no shuffle): at 100 TB each is a map-only stage
  * that scans the text column once, and Catalyst prunes every other
  * column from the parquet read.
  */
object TextAnalysis {

  /** Whitespace tokenizer (regex split on runs of spaces, trimmed). */
  def tokens(text: Column): Column = split(trim(text), " +")

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** The packed-lane folds carry counts in 16-bit lanes: a document with
    * ≥ `limit` tokens would silently wrap a lane (or, for a lane packed
    * at bit 48, trip ANSI long-overflow mid-fold — hence langId's lower
    * 2^15 bound). Fail loudly instead — at pipeline scale a silent
    * corruption poisons downstream dedup/quality filtering invisibly;
    * callers with monster documents should chunk them first. The guard
    * is a lazy CASE branch, so the fold never runs for oversized docs. */
  private[ops] def laneGuard(toks: Column, packed: Column, op: String,
      limit: Int = 65536): Column =
    when(size(toks) >= limit,
      raise_error(concat(lit(s"$op: 16-bit lane overflow — "),
        size(toks).cast("string"), lit(s" tokens (limit ${limit - 1})"))).cast("long"))
      .otherwise(packed)

  /** Quality metrics: token count, stopword count/ratio, mean token
    * length. Ratios are single IEEE divisions of exact integer counts —
    * deterministic and oracle-portable.
    *
    * All three counters ride ONE fold over the token array in 16-bit
    * lanes of a packed long (token count ≤ 64k, Σ token length ≤ 4G):
    * the text is tokenized once per row instead of once per counter
    * (separate counter expressions each inline the split — measured
    * ~1.4× on wide scans). Lane extraction is integer-exact, so results
    * are identical to independent counters. */
  private def qualityPacked(toks: Column): Column =
    laneGuard(toks, aggregate(toks, lit(0L), (acc, t) =>
      acc + lit(1L) +
        when(t.isin(stopwords.map(w => w: Any): _*), lit(1L << 16)).otherwise(lit(0L)) +
        (length(t).cast("long") * lit(1L << 32))), "quality")

  def quality(df: DataFrame, textCol: String = "text"): DataFrame = {
    df.withColumn("_p", qualityPacked(tokens(col(textCol))))
      .withColumn("n_tokens", expr("_p % 65536"))
      .withColumn("stop_cnt", expr("(_p div 65536) % 65536"))
      .withColumn("sum_len", expr("_p div 4294967296"))
      .withColumn("stop_ratio", col("stop_cnt") / col("n_tokens"))
      .withColumn("avg_tok_len", col("sum_len") / col("n_tokens"))
      .drop("_p")
  }

  /** Intra-document repetition signals — the Gopher/MassiveText
    * duplicate-n-gram-fraction filter class: the fraction of
    * unigram/bigram/trigram positions occupied by repeats,
    * `1 − |distinct|/|total|`. High values mark boilerplate loops and
    * degenerate generations; production pipelines threshold these
    * per-n. Map-only array arithmetic per row (no shuffle); ratios are
    * two IEEE ops on exact integer counts — oracle-portable.
    *
    * @param toksCol a MATERIALIZED token-array column — cache or
    * checkpoint the frame first. Shingling indexes the array once per
    * gram position, so an inline `split` here would re-tokenize the
    * text per element access: O(tokens²) per row, measured 67 s vs
    * 0.5 s on 5000 docs at sf0.1 (the shingleFrame trap). */
  // |k-grams| = n − (k−1) by construction, so the denominator (and
  // the empty guard) is arithmetic on ONE size() call and each
  // interpreted shingle transform evaluates exactly once — HOF
  // projections get no common-subexpression elimination, so a
  // size(grams) denominator would re-run the transform per reference
  // (measured 2.1 s → 1.2 s at sf0.1). The guard also keeps
  // shingles() from evaluating on sub-k docs, where sequence(1, n−k+1)
  // would produce a DESCENDING index range and an invalid element_at.
  // `toks` must be cheap to reference: a materialized column or a
  // lambda-bound variable, never an inline split.
  private def dupFrac(toks: Column, k: Int): Column = {
    val cnt = size(toks).cast("long") - (k - 1)
    val grams = if (k == 1) toks else Dedup.shingles(toks, k)
    when(cnt > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / cnt)
      .otherwise(lit(0.0))
  }

  def repetition(df: DataFrame, toksCol: String = "toks"): DataFrame =
    df.withColumn("dup_tok_frac", dupFrac(col(toksCol), 1))
      .withColumn("dup_2gram_frac", dupFrac(col(toksCol), 2))
      .withColumn("dup_3gram_frac", dupFrac(col(toksCol), 3))

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with fixed tie-break order. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "los"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "du"))

  // all four language scores in one fold (16-bit lanes; see quality());
  // 4 lanes → the top lane sits at bit 48; cap at 2^15 so its carry
  // can't reach the sign bit under ANSI arithmetic
  private def langPacked(toks: Column): Column =
    laneGuard(toks, aggregate(toks, lit(0L), (acc, t) =>
      acc + langMarkers.zipWithIndex.map { case ((_, words), i) =>
        when(t.isin(words.map(w => w: Any): _*), lit(1L << (16 * i))).otherwise(lit(0L))
      }.reduce(_ + _)), "langId", limit = 32768)

  /** Argmax over the four `s_<lang>` score columns with tie-break in
    * declaration order (en > es > de > fr). */
  private def predLang: Column = langMarkers.map(_._1) match {
    case Seq(a, b, c, d) =>
      when(col(s"s_$a") >= col(s"s_$b") && col(s"s_$a") >= col(s"s_$c") &&
        col(s"s_$a") >= col(s"s_$d"), a)
        .when(col(s"s_$b") >= col(s"s_$c") && col(s"s_$b") >= col(s"s_$d"), b)
        .when(col(s"s_$c") >= col(s"s_$d"), c)
        .otherwise(d)
  }

  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = langMarkers.map(_._1).zipWithIndex
      .foldLeft(df.withColumn("_p", langPacked(tokens(col(textCol))))) {
        case (acc, (lang, i)) =>
          acc.withColumn(s"s_$lang", expr(s"(_p div ${1L << (16 * i)}) % 65536"))
      }
      .drop("_p")
    scored.withColumn("pred_lang", predLang).drop("toks")
  }

  /** Token counting three ways: whitespace, regex word tokens, and the
    * bytes/4 BPE-count heuristic. */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_ws", size(tokens(col(textCol))).cast("long"))
      .withColumn("n_re",
        size(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).cast("long"))
      .withColumn("bpe_est",
        ceil(octet_length(col(textCol)) / lit(4.0)).cast("long"))

  /** Content-defined fingerprint: md5 over the sorted distinct token set
    * (word-order-insensitive; catches shuffled near-dups exactly).
    * md5 is used deliberately — identical in every engine, so the
    * fingerprint is stable across the Spark/DuckDB boundary and across
    * cluster re-runs. */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fp",
      md5(array_join(array_sort(array_distinct(tokens(col(textCol)))), " ")))

  /** The fused corpus profile: every per-doc text signal — quality
    * counters, language scores + prediction, duplicate-n-gram
    * fractions, content fingerprint, regex/BPE token estimates — in
    * ONE pass over the text column.
    *
    * The point is scan economy: at 100 TB, running quality / langId /
    * repetition / fingerprint / tokenCounts as separate jobs reads the
    * corpus five times; a profiling pass before filtering should read
    * it once. The token array is let-bound through a 1-element
    * `transform` lambda (the [[graft.ops.Admission.signatures]]
    * pattern), so the text is tokenized exactly once per row and every
    * signal references the bound array — no cache barrier, no
    * re-tokenization, and each signal's arithmetic is the SAME
    * expression the single-signal operator uses (results are
    * bit-identical to running them separately; the spec pins this).
    * Struct extraction happens behind the projection boundary
    * (CollapseProject keeps the expensive fold un-inlined — the
    * established packed-lane pattern). Map-only: no shuffle, and the
    * parquet scan prunes to (id cols, text). */
  def profile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val prof = element_at(transform(array(tokens(col(textCol))), toks =>
      struct(
        qualityPacked(toks).as("q"),
        langPacked(toks).as("l"),
        dupFrac(toks, 1).as("d1"),
        dupFrac(toks, 2).as("d2"),
        dupFrac(toks, 3).as("d3"),
        md5(array_join(array_sort(array_distinct(toks)), " ")).as("fp"))), 1)
    val scored = langMarkers.map(_._1).zipWithIndex
      .foldLeft(df.withColumn("_pr", prof)) { case (acc, (lang, i)) =>
        acc.withColumn(s"s_$lang", expr(s"(_pr.l div ${1L << (16 * i)}) % 65536"))
      }
    scored
      .withColumn("n_tokens", expr("_pr.q % 65536"))
      .withColumn("stop_cnt", expr("(_pr.q div 65536) % 65536"))
      .withColumn("sum_len", expr("_pr.q div 4294967296"))
      .withColumn("stop_ratio", col("stop_cnt") / col("n_tokens"))
      .withColumn("avg_tok_len", col("sum_len") / col("n_tokens"))
      .withColumn("pred_lang", predLang)
      .withColumn("dup_tok_frac", col("_pr.d1"))
      .withColumn("dup_2gram_frac", col("_pr.d2"))
      .withColumn("dup_3gram_frac", col("_pr.d3"))
      .withColumn("fp", col("_pr.fp"))
      .withColumn("n_re",
        size(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).cast("long"))
      .withColumn("bpe_est",
        ceil(octet_length(col(textCol)) / lit(4.0)).cast("long"))
      .drop("_pr")
  }

  /** Top-k characteristic terms per doc by tf·idf — the corpus-level
    * statistic family (everything above is per-doc map-only; this one
    * genuinely needs corpus aggregation). Used in curation to surface
    * what a document is "about" and to spot term-frequency anomalies.
    *
    * Scale shape: ONE shuffle on (doc, term) builds term frequencies
    * (map-side combine collapses repeats before the exchange), ONE
    * keyed agg on term builds document frequencies from that same
    * frame, and the df table joins back on term — corpus-sized but
    * keyed, never broadcast. The per-doc top-k window partitions by
    * doc. N (corpus doc count) is a single-row agg materialized to a
    * literal — the one bounded driver value.
    *
    * Scoring is transcendental-free on purpose: `tf · N / df` (one
    * IEEE multiply + one divide on exact integer counts) ranks
    * identically to tf·log-idf within a doc whenever comparisons
    * differ, EXCEPT that log compresses — but the ratio form is
    * engine-portable to the bit, which a libm `ln` is not; rank
    * ties break on the term string. */
  def tfidf(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 3): DataFrame = {
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.select(col(idCol)).distinct().count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol)
      .orderBy(col("score").desc, col("term"))
    tf.join(docFreq, "term")
      .withColumn("score",
        col("tf").cast("double") * lit(nDocs.toDouble) / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** C4-style boilerplate removal at token-n-gram granularity: any
    * n-gram of tokens that occurs in at least `minDocs` DISTINCT
    * documents is boilerplate (navigation chrome, license footers,
    * templated headers — whatever the corpus repeats verbatim); every
    * token covered by a boilerplate n-gram is masked out, and the
    * survivors reassemble IN ORDER into `clean_text`. This is the only
    * text operator that REWRITES content from corpus-wide statistics —
    * dedup drops whole documents, this scrubs the repeated spans and
    * keeps the rest.
    *
    * Output: (idCol, n_tokens, n_masked, clean_text), one row per input
    * document (fully-masked documents yield `clean_text = ""`).
    *
    * Scale: the gram-frequency table is ONE hash aggregation with
    * map-side partial counts (the distinct-doc count is two-phase);
    * membership joins back as a band-pruned semi join keyed on the gram
    * string; coverage expansion and the keep anti-join shuffle on
    * (doc, position) — co-partitioned, so the anti-join reuses the
    * distinct's exchange; reassembly is one per-doc `collect_list`
    * bounded by document length. Nothing is quadratic and nothing
    * collects to the driver, so the plan survives a 100 TB corpus —
    * the gram table is the big intermediate, and it is exactly as
    * partitionable as any word-count. */
  def maskBoilerplate(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame = {
    val base = df.select(col(idCol), tokens(col(textCol)).as("toks"))
    // (id, gpos, gram): gram at 0-based gpos covers tokens gpos..gpos+n-1.
    // Guarded: Dedup.shingles' sequence() DESCENDS for size < n (Spark
    // sequence(1, negative) steps -1) — short docs get an empty array.
    // The token array is LET-BOUND through a 1-element transform lambda:
    // interpreted HOFs get no CSE, so an inlined `toks` would re-run the
    // regex split once per element_at of the shingle transform — O(len²)
    // splits per doc (the measured admit.sig trap).
    val grams = base.select(col(idCol),
      posexplode(element_at(transform(array(col("toks")),
        t => when(size(t) >= n, Dedup.shingles(t, n)).otherwise(array())), 1))
        .as(Seq("gpos", "gram")))
    val boiler = grams.groupBy("gram")
      .agg(countDistinct(col(idCol)).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
    val covered = grams.join(boiler.select("gram"), Seq("gram"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("gpos"), col("gpos") + (n - 1))).as("pos"))
      .distinct()
    val kept = base
      .select(col(idCol), posexplode(col("toks")).as(Seq("pos", "tok")))
      .join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    base.select(col(idCol), size(col("toks")).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_masked"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Bigram language-model fluency scoring — the KenLM-filter shape
    * without the transcendentals: the corpus itself is the model
    * (conditional bigram counts), and a document's disfluency signal is
    * the fraction of its bigrams whose conditional probability
    * P(v|u) = count(u,v)/count(u,·) falls below `num/den`. The
    * comparison is integer cross-multiplication (`count(u,v)·den <
    * count(u,·)·num`), so the decision — and the final single-division
    * ratio — is bit-portable across engines; no log-space float sums.
    *
    * Output: (idCol, n_bigrams, n_rare, rare_frac) per document.
    *
    * Scale: the bigram-count model is one map-side-combinable hash
    * aggregation; the context totals fold off the model (vocab-sized,
    * broadcastable); scoring is two equi-joins keyed on the bigram —
    * each document row meets exactly its own bigrams, so the join
    * volume is O(corpus tokens), never O(model × corpus). */
  def lmFluency(df: DataFrame, idCol: String, textCol: String,
      num: Int = 1, den: Int = 30): DataFrame = {
    val base = df.select(col(idCol), tokens(col(textCol)).as("toks"))
    // bigram strings from the shared shingle builder (tokens never
    // contain spaces, so the two halves split back losslessly); same
    // descending-sequence guard and token let-binding as maskBoilerplate
    val bi = base.select(col(idCol),
      explode(element_at(transform(array(col("toks")),
        t => when(size(t) >= 2, Dedup.shingles(t, 2)).otherwise(array())), 1))
        .as("bigram"))
      .select(col(idCol), substring_index(col("bigram"), " ", 1).as("u"),
        substring_index(col("bigram"), " ", -1).as("v"))
    val model = bi.groupBy("u", "v").agg(count(lit(1)).as("bc"))
    val context = model.groupBy("u").agg(sum("bc").as("uc"))
    val scored = bi.join(model, Seq("u", "v")).join(context, Seq("u"))
      .groupBy(idCol).agg(
        count(lit(1)).as("n_bigrams"),
        sum((col("bc") * den < col("uc") * num).cast("long")).as("n_rare"))
    base.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .withColumn("rare_frac", when(col("n_bigrams") === 0, lit(0.0))
        .otherwise(col("n_rare").cast("double") / col("n_bigrams")))
  }

  /** Conservative RE2-portable PII patterns (both engines' regex
    * dialects agree on this subset — no lookaround, no backrefs). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "[0-9]{3}-[0-9]{4}"

  /** PII redaction — the scrub every released training corpus runs:
    * emails then phone-like numbers are counted and replaced with
    * typed placeholders, IN THAT ORDER (phones are counted on the
    * email-redacted text, so a digit run inside an email address is
    * never double-counted). Replaces `textCol` in place and adds
    * `n_emails`/`n_phones`. Map-only: two regex passes per row, no
    * shuffle; counts make the scrub auditable (Σ n_emails over the
    * corpus = the release report's redaction line). */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(emailPattern), lit(0))).cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), emailPattern, "<EMAIL>"))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(phonePattern), lit(0))).cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), phonePattern, "<PHONE>"))
}
