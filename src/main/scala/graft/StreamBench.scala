package graft

import org.apache.spark.sql.SparkSession

/** Streaming-sync throughput benchmark: events stream → compact →
  * bucketed-store apply, end to end (the engine-side analog of the
  * reference's replication benchmark rows — `BASELINE.md`'s MB/s table
  * measures this same source→apply path over the MySQL wire).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.StreamBench"
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamBench jdbc"   # Derby target
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamBench dsv2"   # DSv2 source
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamBench delta"  # merge vs delta
  *
  * `dsv2` mode drives the custom ChangelogSource (spooled segment files,
  * executor-side splits) with rate-limited batches instead of the file
  * stream — validating the chunked-split arithmetic at volume.
  *
  * `delta` mode runs the SAME multi-batch key-spray drain (the events
  * table sliced into SPARK_GRAFT_STREAM_SLICES segments, default 8; the
  * uniform pk distribution makes every batch touch every bucket) through
  * both incremental parquet sinks — `parquet_merge` (BucketStore:
  * read-modify-write O(touched state) per batch) and `parquet_delta`
  * (DeltaStore: O(|batch|) append, merge deferred to read) — asserts the
  * two final states are row-identical, and prints one JSON line per sink
  * plus a `state_read_secs` line timing the read side of the trade
  * (bucket scan vs LWW fold vs fold-after-snapshot).
  *
  * Prints one JSON line: events ingested, wall seconds, events/s, and
  * the final state row count (validated against one-shot compaction).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, appName = "graft-streambench")

    if (args.contains("dsv2")) { runDsv2(spark, sfDir); spark.stop(); return }
    if (args.contains("dsir")) { runDsir(spark, sfDir); spark.stop(); return }
    if (args.contains("delta")) { runDeltaVsMerge(spark, sfDir); spark.stop(); return }
    if (args.contains("funnel")) { runFunnel(spark, sfDir); spark.stop(); return }
    val jdbcMode = args.contains("jdbc")
    val target = java.nio.file.Files.createTempDirectory("graft-sbench-t")
      .toString + "/state"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sbench-c").toString
    val events = graft.source.Changelog.events(spark, sfDir).count()

    val url = "jdbc:derby:memory:graftsbench;create=true"
    if (jdbcMode) {
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
    }
    val sinkJson =
      if (jdbcMode) s"""{"type": "jdbc_apply", "url": "$url",
        "checkpoint": "$ckpt", "writers": 8}"""
      else s"""{"type": "parquet_merge", "path": "$target",
        "checkpoint": "$ckpt", "pk": ["tbl", "pk"], "buckets": 64}"""

    val t0 = System.nanoTime()
    graft.pipeline.Pipeline.runStream(spark, s"""{
      "source": {"type": "events_stream", "dir": "$sfDir"},
      "processors": [],
      "sink": $sinkJson
    }""")
    val secs = (System.nanoTime() - t0) / 1e9

    val rows =
      if (jdbcMode) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          val n = (0 until 10).map { i =>
            val rs = st.executeQuery(s"SELECT COUNT(*) FROM SBTEST$i")
            rs.next(); rs.getLong(1)
          }.sum
          st.close(); n
        } finally conn.close()
      } else graft.sink.BucketStore.read(spark, target).get.count()
    val want = graft.op.Compactor.compact(
      graft.source.Changelog.fromEvents(spark, sfDir))
      .filter(org.apache.spark.sql.functions.col("net_op") =!= "delete").count()
    require(rows == want, s"state mismatch: store=$rows oneShot=$want")
    val eps = events / secs
    val mode = if (jdbcMode) "jdbc_apply" else "parquet_merge"
    println(s"""{"metric":"stream_sync_events_per_sec","value":$eps,""" +
      s""""unit":"events/sec","sink":"$mode","events":$events,"secs":$secs,""" +
      s""""state_rows":$rows,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Frozen-weights streaming selection (stream_dsir's task shape) at
    * bench scale: fit the weight table once on the corpus, drain the
    * corpus as 6 doc_id-range slices through the dsir_admit sink, and
    * cross-check the admitted id set against the one-shot batch
    * scoring — they must be EQUAL (frozen weights make per-doc scores
    * batch-independent; what this probe exercises is that trigger
    * boundaries, checkpointing, and the append feed preserve that).
    * Reports docs/sec and the PhaseClock drain/apply split. */
  private def runDsir(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-sbench-dsir")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val nDocs = docs.count()
      graft.ops.Selection.fitWeights(docs, col("lang") === "en", "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/weights.parquet")
      graft.PhaseClock.reset()
      val t0 = System.nanoTime()
      graft.pipeline.Pipeline.runStream(spark, s"""{
        "source": {"type": "documents_stream", "dir": "$sfDir", "slices": 6},
        "processors": [],
        "sink": {"type": "dsir_admit", "path": "$tmp/feed",
                 "checkpoint": "$tmp/ckpt",
                 "weightsPath": "$tmp/weights.parquet",
                 "idCol": "doc_id", "textCol": "text", "threshold": 0}
      }""")
      val secs = (System.nanoTime() - t0) / 1e9
      val admitted = spark.read.parquet(s"$tmp/feed")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = graft.ops.Selection.dsirScores(docs, col("lang") === "en",
        "doc_id", "text").filter(col("score") >= 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      require(admitted == want,
        s"admitted mismatch: stream=${admitted.size} batch=${want.size}")
      val ph = graft.PhaseClock.snapshot()
      println(s"""{"metric":"stream_dsir_docs_per_sec","value":${nDocs / secs},""" +
        s""""unit":"docs/sec","docs":$nDocs,"secs":$secs,""" +
        s""""admitted":${admitted.size},""" +
        s""""apply_secs":${ph.getOrElse("apply", 0.0)},""" +
        s""""batches":${ph.getOrElse("batches", 0.0).toLong},"sf":"$sfDir"}""")
    } finally graft.queries.Registry.rmTree(tmp.toFile)
  }

  /** The BucketStore/DeltaStore crossover, measured: one sliced drain
    * (every batch's keys spray across all buckets — BucketStore's worst
    * case, where "touched state" = the whole store every batch) applied
    * through each sink, states cross-validated row-for-row. One-shot
    * compaction is NOT a valid oracle here — a key netting
    * insert→delete WITHIN one batch writes nothing, keeping its prior
    * cross-batch state — so the two sinks, which implement identical
    * apply semantics, check each other instead. */
  private def runDeltaVsMerge(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.DataFrame
    val slices = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICES", "8").toInt
    // event_id = key-spray regime (every batch touches every bucket);
    // user_id = key-locality regime (each batch touches only its own
    // keys' buckets) — the two ends of the BucketStore/DeltaStore trade
    val sliceBy = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICEBY", "event_id")
    val events = graft.source.Changelog.events(spark, sfDir).count()
    // Stage the slice segments BEFORE timing: fromEventsStream stages the
    // (sf, slices) drop dir lazily on first use, so without this the first
    // drain (parquet_merge) would absorb the one-time staging cost the
    // second skips, biasing the comparison.
    graft.streaming.ChangeStream.fromEventsStream(spark, sfDir, slices, sliceBy)
    def drain(sinkType: String, extra: String = ""): (Double, DataFrame, String) = {
      val target = java.nio.file.Files.createTempDirectory(s"graft-sbench-$sinkType")
        .toString + "/state"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-sbench-c").toString
      val t0 = System.nanoTime()
      graft.pipeline.Pipeline.runStream(spark, s"""{
        "source": {"type": "events_stream", "dir": "$sfDir",
                   "slices": $slices, "sliceBy": "$sliceBy"},
        "processors": [],
        "sink": {"type": "$sinkType", "path": "$target",
                 "checkpoint": "$ckpt", "pk": ["tbl", "pk"], "buckets": 64$extra}
      }""")
      val secs = (System.nanoTime() - t0) / 1e9
      val state = sinkType match {
        case "parquet_merge" => graft.sink.BucketStore.read(spark, target).get
        case _ => graft.sink.DeltaStore.read(spark, target).get
      }
      (secs, state, target)
    }
    val (mergeSecs, mergeState, mergeTarget) = drain("parquet_merge")
    val (deltaSecs, deltaState, deltaTarget) = drain("parquet_delta")
    val rows = mergeState.count()
    require(deltaState.count() == rows &&
      mergeState.exceptAll(deltaState).isEmpty &&
      deltaState.exceptAll(mergeState).isEmpty,
      "parquet_merge and parquet_delta final states diverge")
    Seq(("parquet_merge", mergeSecs), ("parquet_delta", deltaSecs)).foreach {
      case (mode, secs) =>
        println(s"""{"metric":"stream_sync_events_per_sec","value":${events / secs},""" +
          s""""unit":"events/sec","sink":"$mode","slices":$slices,""" +
          s""""slice_by":"$sliceBy","events":$events,""" +
          s""""secs":$secs,"state_rows":$rows,"sf":"$sfDir"}""")
    }

    // The other half of the trade: READ cost. BucketStore reads scan one
    // generation per bucket; DeltaStore reads re-pay the LWW fold over
    // the live chains — until snapshot() (offline compaction) folds the
    // store back to one generation. Min of 3 full materializations each.
    def timeRead(df: => DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    val readMerge = timeRead(graft.sink.BucketStore.read(spark, mergeTarget).get)
    val readDelta = timeRead(graft.sink.DeltaStore.read(spark, deltaTarget).get)
    graft.sink.DeltaStore.snapshot(spark, deltaTarget, nBuckets = 64)
    val snapState = graft.sink.DeltaStore.read(spark, deltaTarget).get
    require(snapState.count() == rows &&
      mergeState.exceptAll(snapState).isEmpty &&
      snapState.exceptAll(mergeState).isEmpty,
      "snapshot changed the resolved state")
    val readSnap = timeRead(graft.sink.DeltaStore.read(spark, deltaTarget).get)
    println(s"""{"metric":"state_read_secs","merge":$readMerge,""" +
      s""""delta":$readDelta,"delta_snapshot":$readSnap,""" +
      s""""slices":$slices,"slice_by":"$sliceBy","state_rows":$rows,"sf":"$sfDir"}""")

    // Auto-snapshot policy, end to end: the same drain again with
    // `autoSnapshotGens` set and NO operator snapshot call anywhere —
    // the post-drain read must land at the snapshot number above, not
    // the live-chain number, with the fold cost absorbed into the drain.
    val autoGens = math.max(slices / 4, 2)
    val (autoSecs, autoState, autoTarget) =
      drain("parquet_delta", s""", "maxChain": 100, "autoSnapshotGens": $autoGens""")
    require(autoState.count() == rows &&
      mergeState.exceptAll(autoState).isEmpty &&
      autoState.exceptAll(mergeState).isEmpty,
      "auto-snapshot drain's resolved state diverges")
    val liveAuto = graft.sink.DeltaStore.readManifest(autoTarget)
      .values.flatten.toSet
    val readAuto = timeRead(graft.sink.DeltaStore.read(spark, autoTarget).get)
    println(s"""{"metric":"state_read_secs_autosnap","auto":$readAuto,""" +
      s""""drain_secs":$autoSecs,"auto_snapshot_gens":$autoGens,""" +
      s""""live_gens_at_drain_end":${liveAuto.size},""" +
      s""""snap_fired":${liveAuto.exists(_.startsWith("snap-"))},""" +
      s""""slices":$slices,"slice_by":"$sliceBy","state_rows":$rows,"sf":"$sfDir"}""")
  }

  /** Streaming-funnel STATE probe: the same ts-scrambled drain through
    * the exact form (state grows with step-event history) and the
    * watermark-evicting form (frozen chain prefixes, sub-watermark
    * events evicted, empty users removed) — per-batch state rows/bytes
    * from the query's own progress events. The 100-TB question this
    * answers is state GROWTH, not wall: the reference's whole design is
    * bounded buffers (disruptor.go:15-18), and the TTL knob is the
    * funnel's bound. Wall seconds are reported but single-shot
    * (informational); the state series is deterministic. */
  private def runFunnel(spark: SparkSession, sfDir: String): Unit = {
    val slices = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICES", "8").toInt
    val evictDelay = sys.env.getOrElse("SPARK_GRAFT_FUNNEL_EVICT", "10 days")
    // recentProgress keeps only the last numRecentProgressUpdates
    // entries (default 100): a slice count above that would silently
    // drop the EARLY batches from the state series and fake a plateau —
    // size the retention to the drain, with margin for no-data batches
    // max with the Spark default (100): the override must only ever
    // RAISE retention — slices*2+64 alone dips below stock for <18
    // slices (ADVICE r18)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      math.max(100, slices * 2 + 64).toString)
    // default scrambled (worst case for state: every batch spans the
    // whole time range, so the watermark freezes after batch 1);
    // SPARK_GRAFT_STREAM_SLICEBY=event_id gives TS-ORDERED slices (the
    // fixture is ts-ordered by event_id) — the live-stream shape where
    // event time ADVANCES per batch and TTL state plateaus at the
    // delay-window footprint while the exact form keeps growing
    val sliceBy = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICEBY",
      s"event_id % $slices")
    val steps = Seq("view", "click", "purchase")
    // stage outside the timed region (shared by both legs)
    graft.streaming.ChangeStream.fromEventsRawStream(spark, sfDir, slices, sliceBy)
    def drain(evict: Option[String], withinNs: Option[Long] = None)
        : (Double, Seq[(Long, Long, Long)], Long) =
      // same scale-adaptive state partitioning as the gated funnel path
      // (StreamTuning) — the bench must measure the deployed shape
      graft.streaming.StreamTuning.withDrainPartitions(
        spark, Seq(s"$sfDir/events.parquet")) {
      val tmp = java.nio.file.Files.createTempDirectory("graft-sbench-funnel")
      val raw = graft.streaming.ChangeStream.fromEventsRawStream(
        spark, sfDir, slices, sliceBy)
      val upd = graft.streaming.ChangeStream.streamingFunnel(
        raw, steps, evict, withinNs)
      val q = upd.writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[
             graft.streaming.ChangeStream.FunnelUpd], id: Long) =>
            b.withColumn("_b",
              org.apache.spark.sql.functions.lit(id)).write
              .mode("append").parquet(s"$tmp/out")
            ()
        }
        .start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val per = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .sortBy(_.batchId)
        .map { p => (p.batchId,
          p.stateOperators(0).numRowsTotal,
          p.stateOperators(0).memoryUsedBytes) }
      if (per.size < slices)
        System.err.println(s"[streambench] state series has ${per.size} " +
          s"stateful batches for $slices slices — early batches may be " +
          "missing from recentProgress; raise numRecentProgressUpdates")
      val users = spark.read.parquet(s"$tmp/out")
        .select("user_id").distinct().count()
      (secs, per, users)
    }
    // window leg: the conversion-window form with NO watermark — its
    // state bound comes from the window itself (once a user has an
    // anchor, kept events all sit inside [anchor, anchor+W]), so the
    // exact-under-late-data form plateaus too
    val windowNs = sys.env.getOrElse("SPARK_GRAFT_FUNNEL_WINDOW",
      (7L * 86400L * 1000000000L).toString).toLong
    val (exactSecs, exactPer, exactUsers) = drain(None)
    val (ttlSecs, ttlPer, ttlUsers) = drain(Some(evictDelay))
    val (winSecs, winPer, winUsers) = drain(None, Some(windowNs))
    def js(per: Seq[(Long, Long, Long)], f: ((Long, Long, Long)) => Long) =
      per.map(f).mkString("[", ",", "]")
    Seq(("exact", exactSecs, exactPer, exactUsers, "null", "null"),
        ("ttl", ttlSecs, ttlPer, ttlUsers, s""""$evictDelay"""", "null"),
        ("window", winSecs, winPer, winUsers, "null", windowNs.toString))
      .foreach {
      case (mode, secs, per, users, ev, win) =>
        println(s"""{"metric":"stream_funnel_state","mode":"$mode",""" +
          s""""evict_delay":$ev,"within_ns":$win,""" +
          s""""slices":$slices,"slice_by":"$sliceBy",""" +
          s""""state_rows_per_batch":${js(per, _._2)},""" +
          s""""state_bytes_per_batch":${js(per, _._3)},""" +
          s""""emitted_users":$users,"secs":$secs,"sf":"$sfDir"}""")
    }
  }

  /** DSv2 chunked-source drain: rate-limited batches over spooled segment
    * files, totality + uniqueness asserted (every row exactly once across
    * mid-chunk batch cuts). */
  private def runDsv2(spark: SparkSession, sfDir: String): Unit = {
    val total = graft.source.Changelog.events(spark, sfDir).count()
    @volatile var rows = 0L
    @volatile var batches = 0
    @volatile var maxParts = 0
    val t0 = System.nanoTime()
    val q = spark.readStream.format("graft.source.ChangelogSource")
      .option("dir", sfDir)
      .option("maxRowsPerTrigger", "20000")
      .option("chunkRows", "16384").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches += 1
        maxParts = math.max(maxParts, b.rdd.getNumPartitions)
        rows += b.count()
      }
      .start()
    q.processAllAvailable(); q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    require(rows == total, s"dsv2 drain lost/duplicated rows: $rows != $total")
    println(s"""{"metric":"dsv2_drain_events_per_sec","value":${total / secs},""" +
      s""""unit":"events/sec","events":$total,"secs":$secs,""" +
      s""""batches":$batches,"max_splits":$maxParts,"sf":"$sfDir"}""")
  }
}
