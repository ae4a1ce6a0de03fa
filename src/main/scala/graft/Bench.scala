package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR,
  * materializing results through the noop sink (full evaluation — the
  * reference benchmarks against its DummyOutput the same way). Prints one
  * JSON line for the driver.
  *
  * Each query is measured in its OWN SparkSession (fresh SparkContext,
  * torn down after the median is taken). Two consecutive rounds showed
  * that a session shared across the whole suite accumulates state that
  * inflates later queries by 5-20x over their isolated cost
  * (p2b_canonical 19.99s suite vs 1.03s isolated in r03; w2_sessionize
  * 5.23s vs 0.42s in r04) — the per-query numbers were untrustworthy.
  * Session setup, the parquet-footer warm read, and the JIT/codegen
  * warmup pass all happen inside the query's own session but OUTSIDE the
  * clock; JIT state is JVM-wide so later queries still benefit from
  * earlier ones' warmup, which only helps (it never inflates). */
object Bench {
  // shared engine session recipe (Sessions.local): r21 carried the
  // cached-plan-repartitioning flag here only; it now lives in the one
  // place every entrypoint (Run/Verify/probes) builds its session from,
  // so the bench measures exactly the session production runs.
  private def newSession(cpus: String): SparkSession =
    Sessions.local(cpus, appName = "graft-bench")

  /** Calibration anchor: a fixed, data-independent workload (codegen'd
    * hash agg over a 40M-row range, one 9973-key shuffle) timed in its
    * own session. Query timings can only be compared ACROSS bench runs
    * if the machine was equally loaded in both; round 10 saw 2x min
    * drift on three untouched queries that the within-run median/min
    * guard cannot flag (ambient load inflates every rep alike). The
    * anchor's min is that cross-run control: if it drifts, the run's
    * absolute numbers are inflated by the environment, not the code.
    * KEPT for artifact continuity, but the headline normalizer is the
    * BASKET below — r19 watched this single number wander 0.239→0.521
    * across runs (+20% within ONE run), turning a 12%-faster suite into
    * a phantom 57% driver-facing regression. One probe point cannot
    * calibrate a 150-query suite. */
  private def anchorMin(cpus: String): Double = {
    val spark = newSession(cpus)
    import org.apache.spark.sql.functions._
    def runOne(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 40000000L, 1, 32)
        .select((col("id") % 9973).as("k"), col("id").as("v"))
        .groupBy("k").agg(sum("v"))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    runOne() // JIT/codegen warmup, unmeasured
    val m = (1 to 3).map(_ => runOne()).min
    spark.stop()
    m
  }

  /** Calibration BASKET (r19 verdict): five heterogeneous cheap probes
    * — codegen scan+filter, hash-agg shuffle, sort-merge join, window,
    * and a real parquet scan of the fixture — each normalized by a
    * PINNED per-element reference time and reduced by the MEDIAN of
    * the five ratios. The median of five near-1 ratios tolerates two
    * ambient outliers; the single anchor tolerated none. Measured at
    * START / MIDDLE / END of the suite (per-element min across the
    * three checkpoints = this run's machine floor), so a load burst in
    * one phase of the run cannot poison the whole normalization. */
  private val basketRefs: Seq[(String, Double)] = Seq(
    // reference seconds pinned on the round-20 build box (sf0.1). The
    // absolute values are ARBITRARY fixed units — they cancel in any
    // cross-run ratio; they only center each element's ratio near 1 so
    // the median mixes all five elements instead of electing one.
    "scan_filter" -> 0.06,
    "hash_agg" -> 0.31,
    "shuffle_join" -> 0.49,
    "window" -> 0.56,
    "parquet_scan" -> 0.14)

  private def basketElems(spark: SparkSession, sfDir: String)
      : Seq[(String, () => Unit)] = {
    import org.apache.spark.sql.functions._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    Seq(
      "scan_filter" -> (() => noop(
        spark.range(0, 80000000L, 1, 32)
          .filter((col("id") % 7) === 3).select(col("id") * 3))),
      "hash_agg" -> (() => noop(
        spark.range(0, 40000000L, 1, 32)
          .select((col("id") % 9973).as("k"), col("id").as("v"))
          .groupBy("k").agg(sum("v")))),
      "shuffle_join" -> (() => noop(
        spark.range(0, 4000000L, 1, 32)
          .select((col("id") % 1000000).as("k"), col("id").as("a"))
          .join(spark.range(0, 1000000L, 1, 32).select(col("id").as("k"),
            (col("id") * 2).as("b")), "k"))),
      "window" -> (() => noop(
        spark.range(0, 8000000L, 1, 32)
          .select((col("id") % 65536).as("k"), col("id").as("v"))
          .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("k").orderBy("v"))))),
      "parquet_scan" -> (() => noop(
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(sum(col("l_quantity")), count(lit(1))))))
  }

  /** One basket checkpoint: each element warmed once, min of 3 timed
    * runs, all in ONE fresh session. ~15 s per checkpoint. */
  private def basketPoint(cpus: String, sfDir: String): Map[String, Double] = {
    val spark = newSession(cpus)
    // fail-soft per element: a transient probe failure must cost ONE
    // basket ratio (basketScale tolerates missing elements), never the
    // suite run it calibrates
    val out = basketElems(spark, sfDir).flatMap { case (name, run) =>
      try {
        run() // JIT/codegen warmup, unmeasured
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          run()
          (System.nanoTime() - t0) / 1e9
        }
        Some(name -> times.min)
      } catch { case e: Exception =>
        System.err.println(s"[bench] basket element $name failed: ${e.getMessage}")
        None
      }
    }.toMap
    spark.stop()
    out
  }

  /** Median of the five floor/reference ratios — the run's machine-
    * speed unit. `points` = the per-checkpoint element times. */
  private def basketScale(points: Seq[Map[String, Double]]): Double = {
    val ratios = basketRefs.flatMap { case (name, ref) =>
      val vals = points.flatMap(_.get(name))
      if (vals.isEmpty) None else Some(vals.min / ref)
    }.sorted
    if (ratios.isEmpty) -1.0 else ratios(ratios.length / 2)
  }

  /** The commit the numbers were measured at (+ "-dirty" when the
    * working tree differs) — BENCH artifacts are compared across rounds
    * AND across machines, and without the SHA in the artifact itself a
    * cross-machine delta (r11: mm_phash_neardup 5.07 s driver vs 3.13 s
    * builder) cannot be attributed to commit vs ambient load. */
  private def commitSha: String = try {
    def git(cmd: String*): (Int, String) = {
      val p = new ProcessBuilder(("git" +: cmd): _*)
        .directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      (p.waitFor(), out)
    }
    val (rc, sha) = git("rev-parse", "--short=12", "HEAD")
    if (rc != 0 || sha.isEmpty) "unknown"
    else {
      val (_, status) = git("status", "--porcelain", "--untracked-files=no")
      if (status.nonEmpty) s"$sha-dirty" else sha
    }
  } catch { case _: Exception => "unknown" }

  /** Exact row count from parquet footer metadata (file or directory of
    * part files) — footers carry it, so no scan and no session needed. */
  private def parquetRowCount(path: String): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val root = new java.io.File(path)
    val parts =
      if (root.isDirectory)
        Option(root.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      else Array(root)
    parts.map { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toURI),
        new org.apache.hadoop.conf.Configuration())
      val r = ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Per-query JIT/codegen warmup dominates cold runs (4.3s -> 0.5s
    // observed); one unmeasured pass first unless disabled.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") == "1"
    // Median of `reps` timed runs per query: single-shot timings proved to
    // be environment noise round-over-round (r01 183.9s vs r02 34.8s on
    // identical code). Caches are cleared between runs so every rep pays
    // the query's full cost, including its own cache builds.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ordered = Registry.all.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val phases = scala.collection.mutable.Map.empty[String, Map[String, Double]]
    // cross-run calibration only matters for full-suite comparisons:
    // filtered iteration runs (BENCH_ONLY) skip it unless forced on
    val anchor = sys.env.get("SPARK_GRAFT_BENCH_ANCHOR")
      .map(_ == "1").getOrElse(only.isEmpty)
    val anchorStart = if (anchor) anchorMin(cpus) else -1.0
    val basketPoints = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    if (anchor) basketPoints += basketPoint(cpus, sfDir)
    val middleAt = ordered.size / 2
    val results = ordered.zipWithIndex.flatMap { case ((name, d), qi) =>
      if (anchor && qi == middleAt && qi > 0)
        basketPoints += basketPoint(cpus, sfDir)
      val spark = newSession(cpus)
      // A query that THROWS must not record its fast error path as a
      // legitimate timing (a regression would read as a dramatic
      // improvement): failures are excluded from the per-query map and
      // reported in a "failed" list instead.
      var ok = true
      def runOne(): Unit =
        try d.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          ok = false
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
      // Warm this session (parquet footer cache) outside the clock.
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      if (warmup) { runOne(); spark.catalog.clearCache() }
      // Lifecycle queries record a PhaseClock split (stage/start/apply/
      // drain); keep the split of the MIN rep — the number the driver
      // trusts — so a slow run is attributable from the artifact alone
      // (residual = total - stage - start - drain ≈ final store read).
      def oneRep(): (Double, Map[String, Double]) = {
        spark.catalog.clearCache()
        // clearCache() drops catalog-cached relations but NOT RDD-level
        // persists — a prior rep's localCheckpoint blocks (the iterative
        // clustering queries' lineage cuts) otherwise stay resident and
        // later reps run under block-manager pressure: measured as the
        // recurring dedup_clusters median ≈ 1.7x its own min. Every rep
        // starts from an empty block store.
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = true))
        // also drain the GraphBlocks registry: the sweep above already
        // unpersisted its RDDs, but the strong registry entries (one
        // per iterative-op call) would otherwise accumulate across the
        // suite's hundreds of runs
        graft.ops.GraphBlocks.releaseAll()
        PhaseClock.reset()
        val t0 = System.nanoTime()
        runOne()
        ((System.nanoTime() - t0) / 1e9, PhaseClock.snapshot())
      }
      var timed = (1 to reps).map(_ => oneRep()).sortBy(_._1)
      // Spread = (median − min)/min: the bar that arbitrates a
      // cross-round delta. bench_delta classifies on MIN-based norm
      // ratios, so the relevant noise is how tightly the lower reps
      // cluster — (max − min)/min let one ambient outlier (the class
      // the NOISY guard names separately) inflate the bar forever and
      // hide a real 1.5x regression behind it (r17: graph_closeness
      // 0.73, sketch_overlap 0.58). A bar still above 0.35 buys up to
      // 3 extra reps (genuinely more evidence: min and median both
      // stabilize); if it STAYS wide after that, the variance is real
      // and the stamped value says so.
      def spreadOf(ts: Seq[Double]): Double =
        if (ok && ts.head > 0) (ts(ts.length / 2) - ts.head) / ts.head
        else 0.0
      var extra = 0
      while (ok && extra < 3 && spreadOf(timed.map(_._1)) > 0.35) {
        timed = (timed :+ oneRep()).sortBy(_._1)
        extra += 1
      }
      spark.stop()
      val times = timed.map(_._1)
      if (ok) {
        if (timed.head._2.nonEmpty) phases(name) = timed.head._2
        Some(name -> (times(times.length / 2), times.head, spreadOf(times)))
      } else { failed += name; None }
    }
    // Variance guard: the min is the query's floor on this box — a median
    // far above its own min is environment noise (GC pause, page-cache
    // eviction, a co-tenant burst), not a code regression. Four straight
    // rounds produced phantom 3-4x "regressions" on untouched queries
    // (r05 text_tokens … r08 dedup_incremental) that each burned a judge
    // isolation pass; emitting min alongside median makes them
    // self-clearing. Queries tripping the 1.5x gate are named in "noisy".
    val noisy = results.collect {
      case (name, (med, mn, _)) if mn > 0.0 && med > 1.5 * mn => name
    }
    noisy.foreach { n =>
      val (med, mn, _) = results.toMap.apply(n)
      System.err.println(f"[bench] NOISY $n: median $med%.2fs > 1.5x min $mn%.2fs" +
        " — trust the min; not a regression signal")
    }
    val qs = results.map { case (k, (med, _, _)) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, (_, mn, _)) => "\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val qsSpread = results.map { case (k, (_, _, sp)) =>
      "\"" + k + "\":" + f"$sp%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val totalMin = results.map(_._2._2).sum
    val anchorEnd = if (anchor) anchorMin(cpus) else -1.0
    if (anchor) basketPoints += basketPoint(cpus, sfDir)
    val bScale = basketScale(basketPoints.toSeq)
    // The one baseline-transferable number (BASELINE.md): the reference's
    // batch apply sustains ~130K events/s; compare p8_compact's min-rep
    // throughput at this SF. baseline_ratio = our_time / baseline_time —
    // ≤1.0 beats the reference, the round gate is ≤2.0.
    val baselineJson = results.toMap.get("p8_compact").map { case (_, mn, _) =>
      // row count straight from the parquet footers — no SparkSession
      // spin-up just to count (and no hardcoded core count to get wrong)
      val nEvents = parquetRowCount(s"$sfDir/events.parquet")
      val eps = nEvents / math.max(mn, 1e-9)
      f""""p8_events":$nEvents,"p8_events_per_sec":${eps}%.1f,""" +
        f""""baseline_ratio":${mn * 130000.0 / nEvents}%.3f,"""
    }.getOrElse("")
    // Anchor-normalized ratios: query_min / anchor_min is a machine-speed-
    // independent work unit, so ROUND-OVER-ROUND comparisons read these,
    // not raw seconds — r15's headline moved −9.3% while the anchor
    // itself drifted +28%, and nothing in the artifact said which effect
    // was code. The smaller of the two anchor runs is the run's best
    // estimate of the machine's floor (ambient load only ever inflates).
    val anchorRef =
      if (anchorStart > 0 && anchorEnd > 0) math.min(anchorStart, anchorEnd)
      else -1.0
    val normJson = if (anchorRef > 0) {
      val qn = results.map { case (k, (_, mn, _)) =>
        "\"" + k + "\":" + f"${mn / anchorRef}%.3f" }.mkString("{", ",", "}")
      s""""anchor_min":$anchorRef,"queries_norm":$qn,""" +
        f""""total_min_norm":${totalMin / anchorRef}%.2f,"""
    } else ""
    // BASKET normalization (the r20 headline normalizer — see
    // basketRefs): per-query min / basket_scale, plus the raw per-
    // checkpoint element times so a wandering element is attributable
    // from the artifact alone (the r19 anchor's failure mode).
    val basketJson = if (bScale > 0) {
      val qb = results.map { case (k, (_, mn, _)) =>
        "\"" + k + "\":" + f"${mn / bScale}%.3f" }.mkString("{", ",", "}")
      val pts = basketPoints.zipWithIndex.map { case (p, i) =>
        val label = if (i == 0) "start"
          else if (i == basketPoints.length - 1) "end" else s"mid$i"
        "\"" + label + "\":" + p.toSeq.sortBy(_._1).map { case (e, v) =>
          "\"" + e + "\":" + f"$v%.4f" }.mkString("{", ",", "}")
      }.mkString("{", ",", "}")
      f""""basket_scale":$bScale%.4f,"queries_basket":$qb,""" +
        f""""total_min_basket":${totalMin / bScale}%.2f,""" +
        s""""basket_points":$pts,"""
    } else ""
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val noisyJson = noisy.map("\"" + _ + "\"").mkString("[", ",", "]")
    val phasesJson = phases.toSeq.sortBy(_._1).map { case (q, ps) =>
      "\"" + q + "\":" + ps.toSeq.sortBy(_._1)
        .map { case (p, v) => "\"" + p + "\":" + v }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // Output order: short headline FIRST (totals up front for a human
    // reading the log top-down), full detail second, and the driver-
    // contract line LAST (the driver parses the FINAL stdout line and
    // keeps only a 2000-char tail of the capture; see `contract` above).
    // dev/bench_delta.py accepts any of the shapes.
    val normHead = if (anchorRef > 0)
      f""""total_min_norm":${totalMin / anchorRef}%.2f,""" else ""
    val basketHead = if (bScale > 0)
      f""""basket_scale":$bScale%.4f,"total_min_basket":${totalMin / bScale}%.2f,"""
      else ""
    val headline = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""total_min":$totalMin,"n_queries":${results.size},""" +
      s""""anchor_min":$anchorRef,"commit":"$commitSha",""" +
      normHead + basketHead + baselineJson +
      s""""failed":$failedJson,"sf":"$sfDir"}"""
    // Driver-contract line (printed LAST): the driver parses the final
    // stdout line and expects the per-query map IN it —
    // {"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}. The
    // short headline above never carried "queries" (it lived only in the
    // detail line), so even a clean last line would have left PERF's
    // per_query empty. queries = per-query MEDIAN seconds (the timing
    // the "value" total sums); queries_min rides along because min-of-
    // reps is the noise-robust number every cross-round analysis uses.
    val contract = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$qs,"queries_min":$qsMin,""" +
      s""""total_min":$totalMin,"n_queries":${results.size},""" +
      s""""anchor_min":$anchorRef,"commit":"$commitSha",""" +
      normHead + basketHead + baselineJson +
      s""""failed":$failedJson,"sf":"$sfDir"}"""
    val detail =
      s"""{"metric":"total_detail","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queries_min":$qsMin,"queries_spread":$qsSpread,""" +
      s""""total_min":$totalMin,"noisy":$noisyJson,""" +
      s""""phases":$phasesJson,"anchor_min_start":$anchorStart,""" +
      s""""anchor_min_end":$anchorEnd,"commit":"$commitSha",""" +
      normJson + basketJson + baselineJson +
      s""""failed":$failedJson,"sf":"$sfDir"}"""
    println(headline)
    println(detail)
    println(contract)
    // Sidecar artifact (r19 verdict): belt-and-braces against any stdout
    // capture/truncation trouble — the file is unambiguous: contract
    // line first, full detail second. (The stdout contract itself is
    // restored in build.sbt: run/outputStrategy := StdoutOutput passes
    // the forked JVM's output through raw and Global/showSuccess drops
    // sbt's "[success] Total time …" trailer, so the contract line above
    // IS the last stdout line of `sbt "runMain graft.Bench"`.)
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_headline.json"),
        contract + "\n" + detail + "\n")
    } catch { case e: Exception =>
      System.err.println(s"[bench] sidecar write failed: ${e.getMessage}")
    }
    if (failed.nonEmpty) sys.exit(1)
  }
}
