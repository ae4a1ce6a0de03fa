package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: direct scale evidence for the two hottest paths. Unions
  * the sf tables k× with SHIFTED ids (so key cardinality grows with
  * the data — the realistic growth mode, not hot-key pileup) and times
  * the operator at k=1 vs k=K. A scalable plan grows ≈ linearly; a
  * hidden quadratic (pair blowup, re-derivation trap) shows up as a
  * super-linear jump long before a cluster run would.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleProbe 10"
  */
object ScaleProbe {
  import ProbeUtil.{time, scaled}

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_PROBES=name,name runs a subset — at k=100 a full sweep
    // is an hour-class job; per-path runs keep iteration honest
    val want: String => Boolean =
      sys.env.get("SPARK_GRAFT_PROBES")
        .map(_.split(",").map(_.trim).toSet)
        .map(s => (n: String) => s.contains(n))
        .getOrElse(_ => true)
    val spark = Sessions.local(cpus, appName = "graft-scaleprobe")

    def mat(df: DataFrame, tag: String): DataFrame =
      ProbeUtil.mat(spark, df, tag)
    // Named first-bottleneck: the largest recorded TIME phase at k —
    // the thing that would hit the wall first on a further scale-up.
    // PhaseClock mixes counters (batch/fold/round tallies) into the
    // same map; they are not seconds and must not win the max.
    val counterPhases = Set("delta.folds", "batches", "cc.rounds")
    def topPhase(s: Map[String, Double], prefixes: String*): String =
      s.filter { case (n, _) =>
        !counterPhases(n) &&
          (prefixes.isEmpty || prefixes.exists(n.startsWith)) }
        .toSeq.sortBy(-_._2).headOption.map(_._1).getOrElse("none")

    // P8 compaction: events ×k, user_id AND event_id shifted — both key
    // cardinality and log length grow ×k. Scan is timed separately so
    // the bottleneck call (scan IO vs the pk hash-agg exchange) is
    // measured, not asserted.
    val ev = graft.source.Changelog.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "props", "ts")
    def compactAt(n: Int): (Double, Double, Long) = {
      val in = mat(scaled(ev, Seq("user_id", "event_id"), n), s"p8in$n")
      val (scanSecs, _) = time(in.count())
      val log = graft.source.Changelog.fromEventsDf(in)
      val (secs, rows) = time(graft.op.Compactor.compact(log).count())
      (scanSecs, secs, rows)
    }
    if (want("p8_compact")) {
      compactAt(1) // warm
      val (sc1, c1, r1) = compactAt(1)
      val (sck, ck, rk) = compactAt(k)
      val bn = if (ck - sck > sck) "pk hash-agg exchange" else "input scan"
      println(s"""{"probe":"p8_compact","k":$k,"secs_1":$c1,"secs_k":$ck,""" +
        s""""scan_1":$sc1,"scan_k":$sck,""" +
        s""""rows_1":$r1,"rows_k":$rk,"ratio":${ck / c1},""" +
        s""""bottleneck":"$bn","sf":"$sfDir"}""")
    }

    // MinHash+LSH dedup: documents ×k, shifted doc_id AND a per-copy
    // suffix appended to every WORD — verbatim copies would be genuine
    // cross-copy near-dups (k² pair blowup by DATA construction, not
    // plan behavior), while the suffix makes each copy token-bijective
    // to the original (identical internal dup structure, zero shared
    // shingles across copies). Honest expectation: pairs = ×k exactly,
    // cost ≈ ×k. Tokens are cached before shingling, as in the
    // production queries.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def dedupAt(n: Int): (Double, Long) = {
      val d = ProbeUtil.saltedDocs(docs, n)
      val toksDf = d.select(col("doc_id"),
        graft.ops.TextAnalysis.tokens(col("text")).as("toks")).cache()
      try {
        val sh = toksDf.filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            array_distinct(graft.ops.Dedup.shingles(col("toks"))).as("sh"))
          .withColumn("sig",
            graft.ops.Dedup.minhashFast(col("sh"), 8).cast("array<string>"))
        val bands = graft.ops.Dedup.lshBands(sh, "sig", 4, 2, "doc_id")
        time(graft.ops.Dedup.lshCandidates(bands, "doc_id").count())
      } finally { toksDf.unpersist(); () }
    }
    if (want("dedup_minhash_lsh")) {
      dedupAt(1) // warm
      val (d1, p1) = dedupAt(1)
      val (dk, pk) = dedupAt(k)
      println(s"""{"probe":"dedup_minhash_lsh","k":$k,"secs_1":$d1,"secs_k":$dk,""" +
        s""""pairs_1":$p1,"pairs_k":$pk,"ratio":${dk / d1},"sf":"$sfDir"}""")
    }

    // Sub-document span dedup: same suffix-salted ×k construction —
    // cross-copy chunks are token-bijective to the originals, so
    // distinct chunks and the keeper exchange grow ×k with identical
    // per-copy dup structure. Honest expectation: ≈ ×k (keeper min is
    // map-side combined; the hash join and per-doc rebuild are linear
    // in exploded chunks).
    def spansAt(n: Int): (Double, Long) = {
      val d = mat(ProbeUtil.saltedDocs(docs, n), s"spans$n")
      try time(graft.ops.Dedup.chunkDedup(d, "doc_id", "text", chunkTokens = 8)
        .agg(sum("dup_chunks")).head().getLong(0))
      finally { spark.catalog.clearCache() }
    }
    if (want("dedup_spans")) {
      spansAt(1) // warm
      val (s1, d1) = spansAt(1)
      val (sk, dk) = spansAt(k)
      println(s"""{"probe":"dedup_spans","k":$k,"secs_1":$s1,"secs_k":$sk,""" +
        s""""dups_1":$d1,"dups_k":$dk,"ratio":${sk / s1},"sf":"$sfDir"}""")
    }

    // Leakage-safe split: the full verified-edge chain — LSH candidate
    // join, exact-Jaccard verify, CC (hash-min + pointer jumping), and
    // the md5 cluster-keyed assignment. saltedDocs suffixes every token
    // per copy, so within-copy near-dup structure replicates ×n with
    // ZERO cross-copy shingle overlap: candidates, verified edges, and
    // clusters all grow ×n while CC rounds stay O(log diameter).
    // Honest expectation: ≈ ×k; the first wall is the shingle-digest
    // pass behind the candidate join (cc.edges). nearDupClusters runs
    // EAGERLY (the CC loop), so the whole op is CONSTRUCTED inside
    // time{} (the r17 construction-vs-count trap).
    def splitSafeAt(n: Int): (Double, Long, Map[String, Double]) = {
      val d = mat(ProbeUtil.saltedDocs(docs, n), s"splitsafe$n")
      graft.PhaseClock.reset()
      try {
        val (secs, clusters) = time {
          val labeled = graft.ops.Clusters.nearDupClusters(d, "doc_id", "text")
          graft.ops.Mixing.assignSplits(labeled, "cluster",
              Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
            .select("cluster").distinct().count()
        }
        (secs, clusters, graft.PhaseClock.snapshot())
      } finally { spark.catalog.clearCache() }
    }
    if (want("split_safe")) {
      splitSafeAt(1) // warm
      val (s1, c1, _) = splitSafeAt(1)
      val (sk, ck, ph) = splitSafeAt(k)
      println(s"""{"probe":"split_safe","k":$k,"secs_1":$s1,"secs_k":$sk,""" +
        s""""clusters_1":$c1,"clusters_k":$ck,"ratio":${sk / s1},""" +
        s""""cc_rounds_k":${ph.getOrElse("cc.rounds", 0.0)},""" +
        s""""top_phase":"${topPhase(ph)}","sf":"$sfDir"}""")
    }

    // Fuzzy decontamination: corpus ×k against a FIXED benchmark (the
    // deployment shape — the bench never grows with the corpus). The
    // bench band side is broadcast, so the corpus is never shuffled;
    // cost model is one corpus-linear band-generation scan + a
    // per-candidate verify whose candidate (and hit) count stays
    // CONSTANT — only the corpus's copy-0 slice shares content with
    // the bench (the other copies' salted shingles never collide).
    // Honest expectation: ≈ ×k, band-scan-bound, hits_k == hits_1.
    def decontFuzzyAt(n: Int): (Double, Long) = {
      // fixed bench: every 37th doc of the SALTED copy-0 space (the
      // corpus's copy 0 is token-salted, so the bench must be too or
      // nothing collides), ids re-keyed negative so corpus and bench
      // ids never collide (self-pairs stay content matches, the op's
      // contract)
      val bench = mat(ProbeUtil.saltedDocs(docs, 1)
        .filter(col("doc_id") % 37 === 0)
        .withColumn("doc_id", -col("doc_id") - 1), "dfz_bench")
      val corpus = mat(ProbeUtil.saltedDocs(docs, n), s"dfz$n")
      try time(graft.ops.Decontaminate.contaminatedNear(
        corpus, bench, "doc_id", "text").count())
      finally {
        graft.ops.GraphBlocks.releaseAll()
        spark.catalog.clearCache()
      }
    }
    if (want("decontaminate_fuzzy")) {
      decontFuzzyAt(1) // warm
      val (f1, h1) = decontFuzzyAt(1)
      val (fk, hk) = decontFuzzyAt(k)
      println(s"""{"probe":"decontaminate_fuzzy","k":$k,"secs_1":$f1,""" +
        s""""secs_k":$fk,"hits_1":$h1,"hits_k":$hk,"ratio":${fk / f1},""" +
        s""""sf":"$sfDir"}""")
    }

    // DSIR selection: corpus ×k (salted — the gram space grows with
    // the corpus; the histogram stays `buckets` keys regardless). Cost
    // model: two corpus-linear scans (histogram, then the map-only
    // literal-array scoring fold) + one B-key map-side-combined agg +
    // a TakeOrdered. Honest expectation: ≈ ×k, scan-bound; selected
    // count pinned at the op's k (the output never grows with the
    // corpus).
    def dsirAt(n: Int): (Double, Long) = {
      // full table (the shared `docs` is projected to id/text; the
      // target predicate needs lang)
      val full = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "lang")
      val corpus = mat(ProbeUtil.saltedDocs(full, n), s"dsir$n")
      try time(graft.ops.Selection.dsirSelect(corpus,
        col("lang") === "en", "doc_id", "text", k = 200).count())
      finally spark.catalog.clearCache()
    }
    if (want("dsir_select")) {
      dsirAt(1) // warm
      val (d1, n1) = dsirAt(1)
      val (dk, nk) = dsirAt(k)
      println(s"""{"probe":"dsir_select","k":$k,"secs_1":$d1,""" +
        s""""secs_k":$dk,"sel_1":$n1,"sel_k":$nk,"ratio":${dk / d1},""" +
        s""""sf":"$sfDir"}""")
    }

    // SemDeDup: embeddings ×k (id-shifted; the copies are identical
    // vectors, i.e. genuine semantic dups — finding them is the job).
    // Quantizer resolution grows with the corpus as the op's contract
    // demands, at the balance point cells ∝ √N of the two quadratics
    // (centroid assignment O(N·cells) vs per-cell pairs O(N²/cells)):
    // total O(N^1.5) — the accepted semantic-dedup scale law short of
    // ANN-assisted assignment. Honest expectation: ratio ≈ k^1.5, NOT
    // ×k; the probe exists to pin that law, not to flatter it.
    def semDedupAt(n: Int): (Double, Long) = {
      val cells = math.max(1, (16 * math.sqrt(n.toDouble)).round.toInt)
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val in = mat(scaled(emb, Seq("vec_id"), n), s"sd$n")
      try time(graft.ops.Similarity.semDedup(in, tau = 0.4, cells = cells)
        .filter(col("keep") === 1).count())
      finally spark.catalog.clearCache()
    }
    if (want("dedup_semantic")) {
      semDedupAt(1) // warm
      val (m1, k1) = semDedupAt(1)
      val (mk, kk) = semDedupAt(k)
      println(s"""{"probe":"dedup_semantic","k":$k,"secs_1":$m1,""" +
        s""""secs_k":$mk,"kept_1":$k1,"kept_k":$kk,"ratio":${mk / m1},""" +
        s""""law":"n^1.5 under cells~sqrt(N)","sf":"$sfDir"}""")
    }

    // SemDeDup with ANN-ASSISTED assignment (r20): same ×k fixture and
    // the same cells ∝ √N contract, but centroid assignment routes
    // through √cells super-groups, so the assignment half bends from
    // O(N·√N) to O(N·N^0.25) — the pair half (O(N·cellSize)) is
    // unchanged. Honest expectation: ratio between k^1.25 and the
    // brute leg's k^1.5, converging down as cells grow into the paper
    // regime; kept counts may differ slightly from the brute leg (the
    // IVF probe trade on unseparated seeded cells).
    def semDedupHierAt(n: Int): (Double, Long) = {
      val cells = math.max(1, (16 * math.sqrt(n.toDouble)).round.toInt)
      val sup = math.max(1, math.sqrt(cells.toDouble).round.toInt)
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val in = mat(scaled(emb, Seq("vec_id"), n), s"sdh$n")
      try time(graft.ops.Similarity.semDedup(in, tau = 0.4, cells = cells,
        superCells = sup)
        .filter(col("keep") === 1).count())
      finally spark.catalog.clearCache()
    }
    if (want("dedup_semantic_hier")) {
      semDedupHierAt(1) // warm
      val (m1, k1) = semDedupHierAt(1)
      val (mk, kk) = semDedupHierAt(k)
      println(s"""{"probe":"dedup_semantic_hier","k":$k,"secs_1":$m1,""" +
        s""""secs_k":$mk,"kept_1":$k1,"kept_k":$kk,"ratio":${mk / m1},""" +
        s""""law":"n^1.25 under cells~sqrt(N), superCells~sqrt(cells)",""" +
        s""""sf":"$sfDir"}""")
    }

    // keepFarthest diversity WITNESS (r19 verdict item 7, not a scale
    // leg): the paper prefers keeping the vector farthest from its
    // centroid because the retained set stays more diverse; quantify
    // that on the fixture as the mean pairwise cosine among keepers
    // (LOWER = more diverse) under each keeper rule. The all-pairs
    // mean is quadratic in keepers — fixture-bounded probe arithmetic,
    // not an operator shape.
    // cosine means come back as JSON number strings ("null" when no
    // qualifying pair exists — see meanCos)
    def keeperDiversity(farthest: Boolean): (String, String, Long) = {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val kept = graft.ops.Similarity.semDedup(emb, tau = 0.4, cells = 16,
        keepFarthest = farthest)
        .filter(col("keep") === 1).select("vec_id", "cell")
      val kv = emb.join(kept, "vec_id").cache()
      try {
        val n = kv.count()
        val a = kv.select(col("vec_id").as("a"), col("v").as("av"),
          col("cell").as("ca"))
        val b = kv.select(col("vec_id").as("b"), col("v").as("bv"),
          col("cell").as("cb"))
        def meanCos(pred: org.apache.spark.sql.Column): String = {
          // null-safe: zero qualifying pairs make avg NULL (e.g. all
          // keepers in distinct cells) — emit JSON null (ADVICE r21: a
          // bare NaN literal is not RFC-valid JSON and strict consumers
          // reject the whole probe line) instead of crashing on getDouble
          val r = a.join(b, col("a") < col("b") && pred)
            .select(graft.ops.Similarity.cosine(col("av"), col("bv")).as("c"))
            .agg(avg("c")).head()
          Option(r.getAs[java.lang.Double](0))
            .map(_.doubleValue().toString).getOrElse("null")
        }
        // within-cell is where the keeper rule ACTED (both keepers
        // survived the same tau decision); global is the whole-set view
        (meanCos(col("ca") === col("cb")), meanCos(lit(true)), n)
      } finally { kv.unpersist(); spark.catalog.clearCache() }
    }
    if (want("semdedup_keepers")) {
      val (cE, gE, nE) = keeperDiversity(farthest = false)
      val (cF, gF, nF) = keeperDiversity(farthest = true)
      println(s"""{"probe":"semdedup_keeper_diversity",""" +
        s""""within_cell_cos_earliest":$cE,"within_cell_cos_farthest":$cF,""" +
        s""""global_cos_earliest":$gE,"global_cos_farthest":$gF,""" +
        s""""kept_earliest":$nE,"kept_farthest":$nF,""" +
        s""""note":"lower mean = more diverse retained set",""" +
        s""""sf":"$sfDir"}""")
    }

    // Incremental span admission, STATEFUL: the ×k corpus fed as 4
    // sequential batches against a growing chunk-digest store. Cost
    // model per batch: O(batch chunks) + O(store digest scan) — the
    // probe scan reads one 16-byte column, the append writes only the
    // batch's novel digests; store growth must not leak beyond the
    // narrow scan.
    def spanAdmitAt(n: Int): (Double, Long, Map[String, Double]) = {
      val span = docs.agg(max("doc_id")).head().getLong(0) + 1
      val d = mat(ProbeUtil.saltedDocs(docs, n), s"spanadm$n")
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-spanadm$n")
      val cfg = graft.ops.SpanStore.Config(s"$tmp/store", chunkTokens = 8)
      graft.PhaseClock.reset()
      val quarter = span * n / 4 + 1
      val (secs, _) = time {
        (0 until 4).foreach { b =>
          val batch = d.filter(col("doc_id") >= b * quarter &&
            col("doc_id") < (b + 1) * quarter)
          graft.ops.SpanStore.admitOnly(batch, cfg, b.toLong) // phases: span.probe / span.append
        }
      }
      val stored = graft.ops.SpanStore.readHashes(spark, cfg.target)
        .map(_.count()).getOrElse(0L)
      val phases = graft.PhaseClock.snapshot()
      spark.catalog.clearCache()
      (secs, stored, phases)
    }
    if (want("span_admit")) {
      spanAdmitAt(1) // warm
      val (a1, st1, _) = spanAdmitAt(1)
      val (ak, stk, phk) = spanAdmitAt(k)
      println(s"""{"probe":"span_admit_4batch","k":$k,"secs_1":$a1,"secs_k":$ak,""" +
        s""""stored_1":$st1,"stored_k":$stk,"ratio":${ak / a1},""" +
        s""""bottleneck":"${topPhase(phk, "span.")}","sf":"$sfDir"}""")
    }

    // Streaming corpus admission, STATEFUL: documents ×k (same
    // suffix-salted construction — cross-copy shingles disjoint, so
    // admissions grow ×k, not collisions²) fed as 4 sequential batches
    // against a growing store. Cost model: O(batch signatures) +
    // O(collisions) + O(touched buckets) per batch — the store's growth
    // must not leak into per-batch cost beyond the candidate scan.
    def admitAt(n: Int): (Double, Long, Map[String, Double]) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-probe-admit$n")
      val cfg = graft.ops.Admission.Config(
        target = dir.resolve("store").toString,
        checkpoint = dir.resolve("ckpt").toString)
      // materialized untimed: salting 100 copies with regexp_replace is
      // fixture construction, not admission work
      val d = mat(ProbeUtil.saltedDocs(docs, n), s"admit$n")
      // batches cut by doc_id mod 4: every batch mixes all copies, so
      // batch size grows ×k while the store grows underneath the run
      PhaseClock.reset()
      val (secs, admitted) = time {
        (0 until 4).map { b =>
          graft.ops.Admission.admitBatch(
            d.filter(pmod(col("doc_id"), lit(4)) === b), cfg, b.toLong)
        }.sum
      }
      (secs, admitted, PhaseClock.snapshot())
    }
    if (want("admission_4batch")) {
      admitAt(1) // warm
      val (a1, ad1, _) = admitAt(1)
      val (ak, adk, phk) = admitAt(k)
      val ph = phk.toSeq.sortBy(-_._2).take(4)
        .map { case (n2, v) => s""""$n2":$v""" }.mkString(",")
      println(s"""{"probe":"admission_4batch","k":$k,"secs_1":$a1,"secs_k":$ak,""" +
        s""""admitted_1":$ad1,"admitted_k":$adk,"ratio":${ak / a1},""" +
        s""""phases_k":{$ph},"bottleneck":"${topPhase(phk, "admit.", "delta.")}",""" +
        s""""sf":"$sfDir"}""")
    }

    // parquet_delta drain, STATEFUL: events ×k through the full
    // checkpointed 4-slice streaming lifecycle into a DeltaStore with
    // chain-cap folds (stream_sync's shape). The apply phase
    // (PhaseClock) is the state-dependent cost — O(|batch|) appends +
    // amortized chain folds; stream startup/commit is fixed, so total
    // ratio should come in UNDER k and apply ratio ≈ k or below.
    val evRaw = graft.source.Changelog.events(spark, sfDir)
      .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    def drainAt(n: Int): (Double, Double, Map[String, Double]) = {
      val evDir = java.nio.file.Files.createTempDirectory(s"graft-probe-ev$n")
      scaled(evRaw, Seq("user_id", "event_id"), n)
        .write.mode("overwrite").parquet(s"$evDir/events.parquet")
      val st = java.nio.file.Files.createTempDirectory(s"graft-probe-state$n")
      PhaseClock.reset()
      val (secs, _) = time {
        graft.pipeline.Pipeline.runStream(spark, s"""{
          "source": {"type": "events_stream", "dir": "$evDir", "slices": 4},
          "processors": [],
          "sink": {"type": "parquet_delta", "path": "$st/state",
                   "checkpoint": "$st/ckpt", "pk": ["tbl", "pk"],
                   "buckets": 16, "maxChain": 2}
        }""")
      }
      val ph = PhaseClock.snapshot()
      (secs, ph.getOrElse("apply", 0.0), ph)
    }
    if (want("delta_drain_4slice")) {
      drainAt(1) // warm
      val (t1, ap1, _) = drainAt(1)
      val (tk, apk, phk) = drainAt(k)
      val ph = phk.toSeq.sortBy(-_._2).take(5)
        .map { case (n2, v) => s""""$n2":$v""" }.mkString(",")
      println(s"""{"probe":"delta_drain_4slice","k":$k,"secs_1":$t1,"secs_k":$tk,""" +
        s""""apply_1":$ap1,"apply_k":$apk,"ratio":${tk / t1},""" +
        s""""apply_ratio":${apk / ap1},"phases_k":{$ph},""" +
        s""""bottleneck":"${topPhase(phk, "delta.", "stage", "start")}",""" +
        s""""sf":"$sfDir"}""")
    }

    // IVF sampled k-means: the per-ITERATION cost must be independent of
    // corpus size (training touches only the bounded hash-ranked sample;
    // the one-time sample selection and the final full-corpus assignment
    // are the only O(corpus) terms). Isolation: time 1 vs 3 Lloyd
    // iterations at each scale — the difference is two pure iterations,
    // with the sample-selection TakeOrdered cancelled out.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def trainAt(n: Int, iters: Int): Double = {
      val span = emb.agg(max("vec_id")).head().getLong(0) + 1
      val d = (0 until n).map { i =>
        emb.withColumn("vec_id", col("vec_id") + i * span)
      }.reduce(_ unionByName _)
      time(graft.ops.Similarity.trainCentroids(d, cells = 16, iters = iters,
        trainSample = 256).count())._1
    }
    if (want("ivf_train_iter")) {
      trainAt(1, 1) // warm
      val it1 = (trainAt(1, 3) - trainAt(1, 1)) / 2
      val itk = (trainAt(k, 3) - trainAt(k, 1)) / 2
      println(s"""{"probe":"ivf_train_iter","k":$k,"per_iter_1":$it1,""" +
        s""""per_iter_k":$itk,"ratio":${itk / it1},"sf":"$sfDir"}""")
    }

    // Persisted-IVF serve: the FILE-pruning trade measured directly.
    // Build the index store at 1x and kx (3 increments, frozen batch-0
    // quantizer), then serve the same 32-query top-k (a) through the
    // bucket-pruned read and (b) through the naive full-store scan with
    // a post-join cell filter. The pruned path reads ~nprobe/cells of
    // the store's FILES; per-query growth at kx tracks per-cell posting
    // growth, and the files_full/files_pruned ratio is the on-disk
    // pruning evidence a local wall-clock can't fake.
    def indexAt(n: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-probe-ivf$n")
      val cfg = graft.ops.IvfIndex.Config(
        target = dir.resolve("index").toString,
        checkpoint = dir.resolve("ckpt").toString, cells = 16)
      val span = emb.agg(max("vec_id")).head().getLong(0) + 1
      val d = (0 until n).map { i =>
        emb.withColumn("vec_id", col("vec_id") + i * span)
      }.reduce(_ unionByName _)
      val lo = d.agg(min("vec_id")).head().getLong(0)
      val hi = d.agg(max("vec_id")).head().getLong(0)
      val sp = (hi - lo + 3) / 3
      (0 until 3).foreach { b =>
        graft.ops.IvfIndex.indexBatch(
          d.filter(col("vec_id") >= lo + b * sp && col("vec_id") < lo + (b + 1) * sp),
          cfg, b.toLong)
      }
      cfg.target
    }
    // TWO query vectors (a point-lookup-shaped serve, the latency case
    // pruning exists for): their probed union is ≤8 of 16 cells — a
    // 32-query batch would probe every cell and prune nothing, which is
    // the batch regime where the full scan is the right plan anyway
    val embQ = emb.filter(col("vec_id") < 2)
    def servePruned(target: String): Double =
      time(graft.ops.IvfIndex.serve(spark, target, embQ, k = 5).count())._1
    def serveFull(target: String): Double = time {
      val cent = graft.ops.IvfIndex.readCentroids(spark, target).get
      val q = graft.ops.Similarity
        .assignCells(embQ, cent, "qid", "qv", probes = 4, "vec_id", "v")
      val corpus = graft.sink.DeltaStore.readAppendOnly(spark, target, None).get
        .select(col("vec_id").as("nid"), col("v").as("nv"), col("cell"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("nid"))
      corpus.join(q, Seq("cell")).filter(col("nid") =!= col("qid"))
        .drop("cell").distinct()
        .withColumn("cos", graft.ops.Similarity.cosine(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5).count()
    }._1
    if (want("ivf_serve_pruned")) {
      val idx1 = indexAt(1)
      servePruned(idx1); serveFull(idx1) // warm both paths
      val sv1 = servePruned(idx1)
      val idxK = indexAt(k)
      servePruned(idxK); serveFull(idxK) // warm at scale too
      val svK = servePruned(idxK)
      val svFullK = serveFull(idxK)
      val filesFull = graft.sink.DeltaStore.readAppendOnly(spark, idxK, None)
        .get.inputFiles.length
      // probed-cell file count for THIS query set (recomputed as serve does)
      val centK = graft.ops.IvfIndex.readCentroids(spark, idxK).get
      val probedK = graft.ops.Similarity
        .assignCells(embQ, centK, "qid", "qv", probes = 4, "vec_id", "v")
        .select("cell").distinct().collect().map(_.getLong(0).toInt).toSet
      val filesPruned = graft.sink.DeltaStore
        .readAppendOnly(spark, idxK, Some(probedK)).get.inputFiles.length
      println(s"""{"probe":"ivf_serve_pruned","k":$k,"serve_1":$sv1,""" +
        s""""serve_k":$svK,"serve_full_k":$svFullK,""" +
        s""""files_pruned":$filesPruned,"files_full":$filesFull,""" +
        s""""ratio":${svK / sv1},"sf":"$sfDir"}""")
    }

    // int8 IVF serving: the representation trade measured directly —
    // total shuffle WRITE bytes for the same topk query served from the
    // double corpus (ivfTopK) vs the quantized corpus (ivfTopKQ8). The
    // listener is async; the sleep lets the bus drain before reading
    // (dev probe — a stray straggler event under-counts both sides
    // alike, the RATIO is the evidence).
    def shuffledBytes(f: => Unit): Long = ProbeUtil.shuffledBytes(spark)(f)
    val q32 = emb.filter(col("vec_id") < 32)
    def runNoop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    if (want("ivf_q8_shuffle_bytes")) {
      runNoop(graft.ops.Similarity.ivfTopK(emb, q32, 5)) // warm
      val bytesD = shuffledBytes(runNoop(graft.ops.Similarity.ivfTopK(emb, q32, 5)))
      val bytesQ = shuffledBytes(runNoop(graft.ops.Similarity.ivfTopKQ8(emb, q32, 5)))
      println(s"""{"probe":"ivf_q8_shuffle_bytes","double":$bytesD,""" +
        s""""int8":$bytesQ,"ratio":${bytesD.toDouble / bytesQ},"sf":"$sfDir"}""")
    }

    // Composed IVF+PQ SERVING vs plain IVF: here shuffle bytes are the
    // right axis — the candidate cell join is the ANN family's
    // largest-volume exchange, and the served index sends (nid, codes)
    // through it instead of the double vector (pq_bytes covers storage;
    // this covers the wire). The index is materialized untimed — the
    // deployment encodes ONCE and serves many; a first probe draft
    // measured ivfPqTopK's per-call encode aggregations into the serve
    // number and at 2k vectors they swamped the join savings.
    if (want("ivf_pq_shuffle_bytes")) {
      import graft.ops.Similarity
      val coarse = Similarity.seedCentroids(emb, 16,
        Similarity.seedHashFor("vec_id", portableSeeding = true), "vec_id", "v")
      val pqCent = Similarity.pqTrain(emb, m = 4, k = 8, iters = 1,
        portableSeeding = true, trainSample = 256)
      val ixDir = java.nio.file.Files.createTempDirectory("graft-probe-ivfpq")
      Similarity.assignCells(emb, coarse, "nid", "nv", probes = 1, "vec_id", "v")
        .select("nid", "cell")
        .join(Similarity.pqEncode(emb, pqCent, m = 4, k = 8)
          .withColumnRenamed("vec_id", "nid"), "nid")
        .write.mode("overwrite").parquet(s"$ixDir/index.parquet")
      val index = spark.read.parquet(s"$ixDir/index.parquet")
      def servePq(): Unit = runNoop(Similarity.ivfPqServe(index, q32,
        coarse, pqCent, topK = 5))
      servePq() // warm
      val bytesD = shuffledBytes(runNoop(graft.ops.Similarity.ivfTopK(emb, q32, 5)))
      val bytesP = shuffledBytes(servePq())
      println(s"""{"probe":"ivf_pq_shuffle_bytes","double":$bytesD,""" +
        s""""ivf_pq":$bytesP,"ratio":${bytesD.toDouble / bytesP},"sf":"$sfDir"}""")
    }

    // PQ: the representation trade measured where it actually bites at
    // 100 TB — the PERSISTED index. The serve-path shuffles are tiny on
    // both sides (WindowGroupLimit prunes the top-k exchange map-side),
    // so the claim is storage/scan width: parquet bytes of the raw
    // double corpus vs its 4-code PQ encoding (built once, reused every
    // serve), plus the one-time train+encode cost that buys it.
    if (want("pq_bytes")) {
      def dirBytes(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum
        finally s.close()
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-probe-pq")
      emb.write.mode("overwrite").parquet(s"$dir/raw.parquet")
      val (encSecs, _) = time {
        val cent = graft.ops.Similarity.pqTrain(emb, m = 4, k = 8, iters = 1,
          portableSeeding = true, trainSample = 256)
        graft.ops.Similarity.pqEncode(emb, cent, m = 4, k = 8)
          .write.mode("overwrite").parquet(s"$dir/codes.parquet")
      }
      val rawB = dirBytes(java.nio.file.Paths.get(s"$dir/raw.parquet"))
      val pqB = dirBytes(java.nio.file.Paths.get(s"$dir/codes.parquet"))
      println(s"""{"probe":"pq_bytes","raw":$rawB,"pq":$pqB,""" +
        s""""ratio":${rawB.toDouble / pqB},"encode_secs":$encSecs,""" +
        s""""sf":"$sfDir"}""")
    }

    // JDBC batch apply — the path behind the reference's headline number
    // (BASELINE.md's batch-mixed tps is exactly compact-then-execute).
    // Phases split: `compact` = the one-shot changelog fold (engine
    // side), `execute` = statement generation + PreparedStatement
    // batches against an embedded Derby target (delivery side).
    // Execute work is O(|net keys|) by construction — the honest
    // expectation at 10x keys is execute ≈ 10x minus amortized fixed
    // costs (connections, statement shapes, JVM warmup), so wall comes
    // in UNDER k; a super-linear execute would flag a per-row
    // re-preparation or fallback storm.
    //
    // Measurement shape (r14 lesson): the scaled log is MATERIALIZED to
    // parquet first, so the timed compact runs over a plain scan — the
    // same plan at every k, and the same plan the p8 probe and the
    // production path measure. The r14 variant compacted the k-way
    // union straight into `.cache()`, so the "compact" number silently
    // included a k×-sized cache materialization (memory-store writes +
    // eviction churn at k=10): 13.8× apparent at 10× vs the p8 probe's
    // 3.64× on identical work. Net rows land in parquet (untimed) so
    // execute still reads a materialized input, not a recompute.
    def jdbcAt(n: Int): (Double, Double, Long) = {
      val url = s"jdbc:derby:memory:graftprobe$n;create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        (0 until 10).foreach { i =>
          try st.execute(s"DROP TABLE SBTEST$i") catch { case _: Exception => () }
          st.execute(s"CREATE TABLE SBTEST$i " +
            "(PK BIGINT PRIMARY KEY, R_ID BIGINT, R_K INT, R_V DOUBLE)")
        }
        st.close()
      } finally conn.close()
      val dir = java.nio.file.Files.createTempDirectory(s"graft-probe-jdbc$n")
      scaled(ev, Seq("user_id", "event_id"), n)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val log = graft.source.Changelog.fromEventsDf(
        spark.read.parquet(s"$dir/events.parquet"))
      val (cSecs, rows) = time(graft.op.Compactor.compact(log).count())
      graft.op.Compactor.compact(log)
        .write.mode("overwrite").parquet(s"$dir/net.parquet")
      val net = spark.read.parquet(s"$dir/net.parquet")
      val (eSecs, _) = time(
        graft.sink.JdbcApply(net, graft.sink.JdbcApply.Config(url)))
      (cSecs, eSecs, rows)
    }
    if (want("jdbc_apply_10x")) {
      jdbcAt(1) // warm (Derby boot + codegen)
      val (jc1, je1, jr1) = jdbcAt(1)
      val (jck, jek, jrk) = jdbcAt(k)
      val bn = if (jek > jck) "jdbc statement execute" else "compact fold"
      println(s"""{"probe":"jdbc_apply_10x","k":$k,"compact_1":$jc1,""" +
        s""""execute_1":$je1,"compact_k":$jck,"execute_k":$jek,""" +
        s""""rows_1":$jr1,"rows_k":$jrk,""" +
        s""""compact_ratio":${jck / jc1},""" +
        s""""execute_ratio":${jek / je1},""" +
        s""""wall_ratio":${(jck + jek) / (jc1 + je1)},""" +
        s""""bottleneck":"$bn","sf":"$sfDir"}""")
    }

    // Connected components: the near-dup cluster graph ×k with shifted
    // sig ids — k disjoint copies, so nodes AND edges grow ×k while
    // component diameter stays fixed. Rounds are O(log diameter)
    // (pointer jumping), so the round count must NOT grow with k and
    // wall growth must come only from per-round data volume.
    val sims = graft.source.Changelog.table(spark, sfDir, "documents")
      .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("sim", graft.ops.Dedup.simhash16(col("toks")))
      .select(col("sim").as("id")).distinct().cache()
    sims.count()
    def ccAt(n: Int): (Double, Long, Map[String, Double]) = {
      // copy tag in the HIGH bits: the radius-2 masks flip low 16 bits
      // only, so ball probes collide within a copy and never across —
      // k exact disjoint copies of the original hamming graph.
      // Materialized via mat(): a cached k-leg union keeps the whole
      // 5k-node union TREE inside the InMemoryRelation, and every
      // downstream plan (edge join a-side, b-side, each CC round)
      // re-embeds and re-analyzes it — at k=100 driver-side plan work
      // dwarfed the actual distributed compute
      val nodes = mat((0 until n).map { i =>
        sims.select((lit(i.toLong * 65536L) + col("id")).as("id"))
      }.reduce(_ unionByName _), s"ccnodes$n").cache()
      nodes.count()
      try {
        val edges = graft.ops.Dedup.hammingBallPairs(
          nodes.select(col("id"), col("id").as("sim")), "sim", "id",
          radius = 2, bits = 16)
        PhaseClock.reset()
        val (secs, merged) = time {
          val labels = PhaseClock.time("cc.call") {
            graft.ops.Clusters.components(nodes, "id", edges, "a_id", "b_id")
          }
          PhaseClock.time("cc.result") {
            labels.filter(col("id") =!= col("comp")).count()
          }
        }
        (secs, merged, PhaseClock.snapshot())
      } finally { nodes.unpersist(); () }
    }
    if (want("cc_components")) {
      ccAt(1) // warm
      val (cc1, ccR1, ph1) = ccAt(1)
      val (cck, ccRk, phk) = ccAt(k)
      // rounds must NOT grow with k (disjoint copies keep the diameter);
      // phases split edge derivation (cc.edges — the hamming ball-probe
      // join) from the propagation loop (cc.round) and the final read
      val ph = phk.toSeq.sortBy(-_._2).take(5)
        .map { case (n2, v) => s""""$n2":$v""" }.mkString(",")
      println(s"""{"probe":"cc_components","k":$k,"secs_1":$cc1,"secs_k":$cck,""" +
        s""""merged_1":$ccR1,"merged_k":$ccRk,"ratio":${cck / cc1},""" +
        s""""rounds_1":${ph1.getOrElse("cc.rounds", 0.0)},""" +
        s""""rounds_k":${phk.getOrElse("cc.rounds", 0.0)},""" +
        s""""phases_k":{$ph},""" +
        s""""bottleneck":"${topPhase(phk, "cc.edges", "cc.round", "cc.result")}","sf":"$sfDir"}""")
    }

    // Global training-order shuffle: documents ×k through the range-sort
    // + zipWithIndex position assignment. ONE range exchange and a count
    // job — cost must track data volume (ratio ≈ k, never k² and never a
    // single-partition sort's cliff; the md5 rank keys are uniform by
    // construction, so the range partitioner cannot skew).
    def shuffleAt(n: Int): (Double, Long) = {
      val d = mat(scaled(docs.select("doc_id"), Seq("doc_id"), n), s"shuf$n")
      time(graft.ops.Mixing.globalShuffle(d, "doc_id").count())
    }
    if (want("global_shuffle")) {
      shuffleAt(1) // warm
      val (s1, sr1) = shuffleAt(1)
      val (sk, srk) = shuffleAt(k)
      println(s"""{"probe":"global_shuffle","k":$k,"secs_1":$s1,"secs_k":$sk,""" +
        s""""rows_1":$sr1,"rows_k":$srk,"ratio":${sk / s1},"sf":"$sfDir"}""")
    }

    // ── sketch vs exact distinct: the refresh-cost trade, measured ──
    // Per-lang distinct-fingerprint counts over docs ×k (salted, so
    // distinct values grow ×k): the EXACT leg's exchange moves every
    // distinct (lang, fp) pair — bytes must grow ~×k — while the HLL
    // leg ships 2^lgK registers per group at ANY corpus size. The wall
    // ratio follows the same split once the scan cost (shared by both)
    // stops dominating. This is the measured form of the Sketches
    // scaladoc's refresh-cost claim.
    // ── funnel, both forms: events ×k with user_id AND event_id
    // shifted (users grow ×k, per-user history length constant — the
    // realistic growth mode). The window form pays k re-sorts of the
    // position subtree; the key form is chained map-side min-aggs.
    // Both must scale ≈ linearly here; the form DIFFERENCE under a hot
    // user is SkewProbe's job (skew_funnel_hotuser), volume is this
    // row's.
    val evF = graft.source.Changelog.events(spark, sfDir)
      .select("user_id", "event_type", "ts_ns", "event_id")
    def funnelAt(n: Int): (Double, Double, Long) = {
      val in = mat(scaled(evF, Seq("user_id", "event_id"), n), s"fun$n").cache()
      in.count()
      try {
        val steps = Seq("view", "click", "purchase")
        val (wSecs, wRows) = time(graft.ops.Funnel.steps(in, "user_id",
          "event_type", steps, Seq("ts_ns", "event_id")).count())
        val keyed = in.withColumn("k",
          graft.ops.Funnel.packedKey(col("ts_ns"), col("event_id")))
        val (kSecs, kRows) = time(graft.ops.Funnel.stepsByKey(keyed,
          "user_id", "event_type", steps, "k").count())
        require(wRows == kRows,
          s"funnel forms disagree at x$n: window=$wRows keys=$kRows")
        (wSecs, kSecs, kRows)
      } finally { in.unpersist(); () }
    }
    if (want("funnel_forms")) {
      funnelAt(1) // warm both legs
      val (w1, k1s, r1) = funnelAt(1)
      val (wk, kks, rk) = funnelAt(k)
      println(s"""{"probe":"funnel_forms","k":$k,""" +
        s""""window_secs_1":$w1,"window_secs_k":$wk,""" +
        s""""keys_secs_1":$k1s,"keys_secs_k":$kks,""" +
        s""""users_1":$r1,"users_k":$rk,""" +
        s""""window_ratio":${wk / w1},"keys_ratio":${kks / k1s},""" +
        s""""bottleneck":"window: per-user sort x3 subtree; keys: """ +
        s"""step-chain hash-agg exchanges","sf":"$sfDir"}""")
    }

    // ── cohort retention: events ×k, same growth mode. One min-agg +
    // one entity join + one cell count; cell count is bounded by
    // (cohorts × offsets), so the output never grows with k — cost is
    // the two keyed exchanges.
    def retAt(n: Int): (Double, Long) = {
      val in = mat(scaled(evF, Seq("user_id", "event_id"), n), s"ret$n").cache()
      in.count()
      try time(graft.ops.Retention.cohorts(in, "user_id", "ts_ns",
        periodNs = 86400L * 1000000000L).count())
      finally { in.unpersist(); () }
    }
    if (want("retention")) {
      retAt(1) // warm
      val (t1, c1) = retAt(1)
      val (tk, ck2) = retAt(k)
      println(s"""{"probe":"retention","k":$k,"secs_1":$t1,"secs_k":$tk,""" +
        s""""cells_1":$c1,"cells_k":$ck2,"ratio":${tk / t1},""" +
        s""""bottleneck":"single entity-keyed agg exchange","sf":"$sfDir"}""")
    }

    // ── retention A/B: the distinct→min→join shape vs the single
    // entity-exchange min+collect_set agg (cohortsAgg). Both legs
    // warmed before either is timed; values compared cell-exact; the
    // plans must genuinely differ (join vs no join) or the probe
    // refuses to time two identical plans.
    if (want("retention_agg")) {
      val period = 86400L * 1000000000L
      def legs(n: Int): (Double, Double) = {
        val in = mat(scaled(evF, Seq("user_id", "event_id"), n), s"retab$n")
          .cache()
        in.count()
        try {
          val joinLeg = graft.ops.Retention.cohortsJoin(
            in, "user_id", "ts_ns", period)
          val aggLeg = graft.ops.Retention.cohorts(
            in, "user_id", "ts_ns", period)
          require(joinLeg.queryExecution.executedPlan.toString.contains("Join") &&
            !aggLeg.queryExecution.executedPlan.toString.contains("Join"),
            "retention_agg probe: plans do not differ as expected")
          def cells(df: DataFrame) =
            df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
              .toMap
          val (cj, ca) = (cells(joinLeg), cells(aggLeg))
          require(cj == ca && cj.nonEmpty,
            s"retention_agg probe: cell mismatch (join=${cj.size} agg=${ca.size})")
          // both legs warmed by the value check above; time min-of-3
          def rep(df: DataFrame): Double =
            (1 to 3).map(_ => time(df.count())._1).min
          (rep(joinLeg), rep(aggLeg))
        } finally { in.unpersist(); () }
      }
      val (j1, a1) = legs(1)
      val (jk, ak) = legs(k)
      println(s"""{"probe":"retention_agg","k":$k,""" +
        s""""join_secs_1":$j1,"agg_secs_1":$a1,""" +
        s""""join_secs_k":$jk,"agg_secs_k":$ak,""" +
        s""""gain_1":${j1 / a1},"gain_k":${jk / ak},"sf":"$sfDir"}""")
    }

    // ── LPA and triangles: part graph ×k as disjoint isomorphic copies
    // (shared span — per-column spans would desynchronize endpoints).
    // LPA rounds are FIXED (iterations budget), so cost must track edge
    // volume; triangles' wedge count grows ×k (per-copy structure
    // unchanged) so the closing join must too — a superlinear jump
    // would be the wedge blowup the orientation trick exists to prevent.
    val eBaseG = ProbeUtil.partEdges(spark, sfDir)
    def lpaAt(n: Int): (Double, Long, Map[String, Double]) = {
      val e = mat(ProbeUtil.sharedSpanCopies(eBaseG, n), s"lpa$n")
      PhaseClock.reset()
      val (secs, rows) = time(
        graft.ops.Graphs.labelPropagation(e, "src", "dst", iterations = 3)
          .count())
      graft.ops.GraphBlocks.releaseAll()
      (secs, rows, PhaseClock.snapshot())
    }
    if (want("lpa")) {
      lpaAt(1) // warm
      val (l1, n1, _) = lpaAt(1)
      val (lk, nk, phk) = lpaAt(k)
      println(s"""{"probe":"lpa","k":$k,"secs_1":$l1,"secs_k":$lk,""" +
        s""""nodes_1":$n1,"nodes_k":$nk,"ratio":${lk / l1},""" +
        s""""rounds_k":${phk.getOrElse("lpa.rounds", 0.0)},""" +
        s""""bottleneck":"${topPhase(phk, "lpa.")}","sf":"$sfDir"}""")
    }
    def triAt(n: Int): (Double, Long, Map[String, Double]) = {
      val e = mat(ProbeUtil.sharedSpanCopies(eBaseG, n), s"tri$n")
      PhaseClock.reset()
      val (secs, rows) = time(
        graft.ops.Graphs.triangles(e, "src", "dst").count())
      graft.ops.GraphBlocks.releaseAll()
      (secs, rows, PhaseClock.snapshot())
    }
    if (want("triangles")) {
      triAt(1) // warm
      val (t1, n1, _) = triAt(1)
      val (tk, nk, phk) = triAt(k)
      println(s"""{"probe":"triangles","k":$k,"secs_1":$t1,"secs_k":$tk,""" +
        s""""nodes_1":$n1,"nodes_k":$nk,"ratio":${tk / t1},""" +
        s""""bottleneck":"${topPhase(phk, "tri.")}","sf":"$sfDir"}""")
    }

    // ── landmark harmonic centrality: part graph ×k disjoint copies,
    // landmark set FIXED at 16 md5-ranked nodes (the gate's r18
    // parameterization). This is the row that certifies the de-scaling:
    // with a fraction-of-nodes landmark set the (lm, node, dist) frame
    // is O(N²) and the ratio would explode; with fixed K the frame is
    // ≤ 16·reach, so cost must track edge volume like BFS. The whole
    // operator (landmark rank + eager lineage-cut rounds) runs inside
    // the timed region — the rounds EXECUTE during construction.
    def closeAt(n: Int): (Double, Long, Map[String, Double]) = {
      val e = mat(ProbeUtil.sharedSpanCopies(eBaseG, n), s"close$n")
      PhaseClock.reset()
      val (secs, rows) = time {
        // candidates from REAL edges only (both endpoints non-null) —
        // the gate's parameterization exactly
        val realE = e.filter(col("src").isNotNull && col("dst").isNotNull)
        val lms = realE.select(col("src").as("lm"))
          .unionByName(realE.select(col("dst").as("lm"))).distinct()
          .orderBy(md5(col("lm").cast("string"))).limit(16)
        graft.ops.Graphs.harmonicCentrality(
          graft.ops.Graphs.landmarkDistances(e, "src", "dst", lms, "lm",
            maxDepth = 3)).count()
      }
      graft.ops.GraphBlocks.releaseAll()
      (secs, rows, PhaseClock.snapshot())
    }
    if (want("closeness")) {
      closeAt(1) // warm
      val (c1, n1, _) = closeAt(1)
      val (ck, nk, phk) = closeAt(k)
      println(s"""{"probe":"closeness","k":$k,"landmarks":16,""" +
        s""""secs_1":$c1,"secs_k":$ck,""" +
        s""""nodes_1":$n1,"nodes_k":$nk,"ratio":${ck / c1},""" +
        s""""rounds_k":${phk.getOrElse("lmbfs.rounds", 0.0)},""" +
        s""""bottleneck":"${topPhase(phk, "lmbfs.")}","sf":"$sfDir"}""")
    }

    if (want("sketch_distinct")) {
      def legs(n: Int): (Double, Long, Double, Long) = {
        val full = spark.read.parquet(s"$sfDir/documents.parquet")
          .select("doc_id", "lang", "text")
        val d = mat(ProbeUtil.saltedDocs(full, n)
          .select(col("lang"), md5(col("text")).as("fp")), s"skd$n")
        d.count() // page in, outside both measured legs
        def runAgg(aggd: DataFrame): Unit =
          aggd.write.mode("overwrite").format("noop").save()
        val exactDf = d.groupBy("lang")
          .agg(countDistinct(col("fp")).as("d"))
        val hllDf = d.groupBy("lang")
          .agg(hll_sketch_estimate(hll_sketch_agg(col("fp"), 12)).as("d"))
        runAgg(exactDf); runAgg(hllDf) // warm both
        val bE = shuffledBytes(runAgg(exactDf))
        val (tE, _) = time(runAgg(exactDf))
        val bH = shuffledBytes(runAgg(hllDf))
        val (tH, _) = time(runAgg(hllDf))
        (tE, bE, tH, bH)
      }
      val (te1, be1, th1, bh1) = legs(1)
      val (tek, bek, thk, bhk) = legs(k)
      println(s"""{"probe":"sketch_distinct","k":$k,""" +
        s""""exact_secs_1":$te1,"exact_secs_k":$tek,""" +
        s""""hll_secs_1":$th1,"hll_secs_k":$thk,""" +
        s""""exact_bytes_1":$be1,"exact_bytes_k":$bek,""" +
        s""""hll_bytes_1":$bh1,"hll_bytes_k":$bhk,""" +
        s""""exact_bytes_ratio":${bek.toDouble / be1},""" +
        s""""hll_bytes_ratio":${bhk.toDouble / bh1},""" +
        s""""bytes_saving_k":${bek.toDouble / bhk},"sf":"$sfDir"}""")
    }
    // mm_phash_neardup phase split (r22 verdict item 7): the query is
    // one lazy map-only plan (synthPng encode → aHash64 decode+hash →
    // band-blocked pair join) with no natural PhaseClock seam — split
    // it here by materializing each stage to parquet and timing the
    // next stage alone, plus the end-to-end form for reference. The
    // decision this feeds: if encode+hash (contract-bound JDK codec
    // work — the gate exists to price REAL decodes) dominates, the
    // query is tight; if the pair join dominates, check candidate
    // fan-out growth at k (the §3 explosion risk).
    if (want("mm_neardup_split")) {
      val docsMm = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id")
      def noop(df: DataFrame): Unit =
        df.write.mode("overwrite").format("noop").save()
      def legs(n: Int): (Double, Double, Double, Double, Long) = {
        val d = mat((0 until n).map(i =>
          docsMm.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id")))
          .reduce(_ unionByName _), s"mmn$n")
        val pngs = graft.ops.Multimodal.synthPng(spark, d, idMod = 64)
        noop(pngs) // warm
        val (tEnc, _) = time(noop(pngs))
        val pngMat = mat(pngs, s"mmp$n")
        val hashes = graft.ops.Multimodal.aHash64(spark, pngMat)
        noop(hashes) // warm
        val (tHash, _) = time(noop(hashes))
        val hashMat = mat(hashes, s"mmh$n")
        val pairsDf = graft.ops.Multimodal.phashNearDup(hashMat, maxDist = 3)
        noop(pairsDf) // warm
        val (tPairs, _) = time(noop(pairsDf))
        val nPairs = pairsDf.count()
        val e2e = graft.ops.Multimodal.phashNearDup(
          graft.ops.Multimodal.aHash64(spark,
            graft.ops.Multimodal.synthPng(spark, d, idMod = 64)), maxDist = 3)
        noop(e2e) // warm
        val (tAll, _) = time(noop(e2e))
        (tEnc, tHash, tPairs, tAll, nPairs)
      }
      val (e1, h1, p1, a1, np1) = legs(1)
      val (ek, hk, pk2, ak, npk) = legs(k)
      println(s"""{"probe":"mm_neardup_split","k":$k,""" +
        s""""encode_1":$e1,"hash_1":$h1,"pairs_1":$p1,"e2e_1":$a1,""" +
        s""""encode_k":$ek,"hash_k":$hk,"pairs_k":$pk2,"e2e_k":$ak,""" +
        s""""npairs_1":$np1,"npairs_k":$npk,""" +
        s""""pairs_ratio":${pk2 / p1},"npairs_ratio":${npk.toDouble / np1},""" +
        s""""bottleneck":"${if (ek + hk > pk2) "codec encode+decode (contract-bound)"
          else "band-blocked pair join"}","sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
