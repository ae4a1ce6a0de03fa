package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.ChangeStream
import graft.streaming.ChangeStream.{FlatEvent, NetRow}

/** Streaming semantics: cross-batch stateful compaction and the
  * micro-batch compact-then-apply path (at-least-once + idempotent). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("slice staging invalidates when the source file is regenerated") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft-restage")
    val src = dir.resolve("events.parquet")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"), src)
    def stagedCount(): Long = {
      // build (or reuse) the staged drop dir, then count its slice rows
      val (drop, _) = ChangeStream.stageEvents(spark, dir.toString, 2, "event_id")
      spark.read.parquet(
        Paths.get(drop, "slice-0.parquet").toString,
        Paths.get(drop, "slice-1.parquet").toString).count()
    }
    val n1 = graft.source.Changelog.events(spark, dir.toString).count()
    assert(stagedCount() == n1 && n1 > 0)
    // the driver regenerates the source at the SAME path (different
    // content): the staged dir must invalidate, not serve stale slices
    Files.copy(Paths.get("/root/testdata/sf0.01/events.parquet"), src,
      StandardCopyOption.REPLACE_EXISTING)
    val n2 = graft.source.Changelog.events(spark, dir.toString).count()
    assert(n2 != n1)
    assert(stagedCount() == n2)
  }

  test("foldGroup: TTL-eviction semantics are deterministic (no manual clock needed)") {
    import ChangeStream.{foldGroup, KeyState}
    def ev(seq: Long, op: String, k: Int = 1): FlatEvent =
      FlatEvent(seq, 7L, "t", op, Some(7L), Some(k), Some(1.0))
    // fresh key, insert-first batch → net insert, inDb after
    val (s1, o1) = foldGroup("t", 7L, None, Seq(ev(0, "insert"), ev(1, "update", 2)))
    assert(o1.map(_.net_op) === Some("insert") && s1.inDb && s1.rK === Some(2))
    // carried state: delete of an APPLIED key must emit delete (one-shot
    // compaction would cancel; incremental delivery must not)
    val (s2, o2) = foldGroup("t", 7L, Some(s1), Seq(ev(2, "delete")))
    assert(o2.map(_.net_op) === Some("delete") && !s2.inDb)
    // delete of a key NOT in the db nets to nothing
    val (_, o3) = foldGroup("t", 7L, Some(s2), Seq(ev(3, "delete")))
    assert(o3 === None)
    // THE EVICTION CONTRACT: after TTL removed the state (prev = None),
    // a returning key's prior existence re-infers from its first op —
    // update-first ⇒ it was applied before eviction ⇒ net update, not
    // insert; insert-first ⇒ genuinely fresh ⇒ net insert
    val (_, oEvictedUpdate) = foldGroup("t", 7L, None, Seq(ev(10, "update", 9)))
    assert(oEvictedUpdate.map(_.net_op) === Some("update"))
    val (_, oEvictedInsert) = foldGroup("t", 7L, None, Seq(ev(10, "insert", 9)))
    assert(oEvictedInsert.map(_.net_op) === Some("insert"))
    // evicted + delete-first: inferred applied ⇒ delete still emits
    val (_, oEvictedDelete) = foldGroup("t", 7L, None, Seq(ev(10, "delete")))
    assert(oEvictedDelete.map(_.net_op) === Some("delete"))
    // delete-then-reinsert within one batch after eviction: prior
    // existence inferred ⇒ net update carrying the reinserted image
    val (s4, o4) = foldGroup("t", 7L, None, Seq(ev(10, "delete"), ev(11, "insert", 5)))
    assert(o4.map(_.net_op) === Some("update") && s4.inDb && s4.rK === Some(5))
  }

  test("processing-time TTL fires for real: state evicted, returning key re-inferred") {
    // closes the "needs StreamManualClock" residual with the REAL
    // clock: eviction is observable because a re-sent insert nets as
    // "insert" when state was evicted (inDb re-inferred from the first
    // op) but "update" when it survived. A dummy-key batch after the
    // deadline forces the timed-out group to be processed, so the test
    // does not depend on no-data micro-batch timing.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[FlatEvent]
    val q = ChangeStream.statefulCompact(mem.toDS(),
        ttl = Some(java.time.Duration.ofMillis(5000)))
      .writeStream.format("memory").queryName("ttlrows").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200))
      .start()
    // NOT processAllAvailable: with a pending processing-time timer the
    // engine keeps planning no-data batches (that is HOW the timeout
    // fires), so availability never quiesces — poll the sink instead
    def awaitRows(n: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("ttlrows").count() < n) {
        assert(System.nanoTime() < deadline, s"sink never reached $n rows")
        assert(q.exception.isEmpty, q.exception.toString)
        Thread.sleep(200)
      }
    }
    try {
      mem.addData(FlatEvent(0, 1, "t", "insert", Some(1), Some(10), Some(1.0)))
      awaitRows(1)
      // control: key 2 re-inserted well WITHIN its TTL — surviving
      // state makes the second insert net "update"
      mem.addData(FlatEvent(1, 2, "t", "insert", Some(2), Some(20), Some(2.0)))
      awaitRows(2)
      mem.addData(FlatEvent(2, 2, "t", "insert", Some(2), Some(21), Some(2.1)))
      awaitRows(3)
      // let key 1's (and by now key 2's) timer expire — the engine's
      // no-data batches run the hasTimedOut branch and remove the state
      Thread.sleep(7000)
      // key 1 returns as an INSERT — evicted; surviving state would
      // have netted "update"
      mem.addData(FlatEvent(3, 1, "t", "insert", Some(1), Some(12), Some(1.2)))
      awaitRows(4)
      val rows = spark.table("ttlrows").as[NetRow].collect().sortBy(_.last_seq)
      assert(rows.map(r => (r.pk, r.net_op)).toSeq == Seq(
        (1L, "insert"), (2L, "insert"), (2L, "update"),
        (1L, "insert")), rows.mkString(", "))
    } finally q.stop()
  }

  test("stateful compaction emits incremental net ops across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[FlatEvent]
    val q = ChangeStream.statefulCompact(mem.toDS())
      .writeStream.format("memory").queryName("netrows").outputMode("update").start()
    try {
      // batch 0: fresh insert+update -> one net insert with latest row
      mem.addData(
        FlatEvent(0, 1, "t", "insert", Some(1), Some(10), Some(1.0)),
        FlatEvent(1, 1, "t", "update", Some(1), Some(11), Some(1.1)))
      q.processAllAvailable()
      // batch 1: delete of the now-applied key 1 must EMIT delete
      // (one-shot compaction would cancel insert→delete; incremental
      // delivery must not, because batch 0's insert was applied);
      // key 2 first seen as update -> prior existence -> net update
      mem.addData(
        FlatEvent(2, 1, "t", "delete", None, None, None),
        FlatEvent(3, 2, "t", "update", Some(2), Some(20), Some(2.0)))
      q.processAllAvailable()
      // batch 2: insert+delete inside one batch of an absent key -> no emission
      mem.addData(
        FlatEvent(4, 3, "t", "insert", Some(3), Some(30), Some(3.0)),
        FlatEvent(5, 3, "t", "delete", None, None, None))
      q.processAllAvailable()

      val rows = spark.table("netrows").as[NetRow].collect()
      val byKeySeq = rows.sortBy(_.last_seq).map(r => (r.pk, r.net_op, r.r_k))
      assert(byKeySeq.toSeq == Seq(
        (1L, "insert", Some(11)),
        (1L, "delete", None),
        (2L, "update", Some(20))))
    } finally q.stop()
  }

  test("windowed counts with watermark run on a bounded stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDS().toDF("ts", "event_type", "value")
    val q = ChangeStream.windowedCounts(df)
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:50:00")
      val t2 = java.sql.Timestamp.valueOf("2024-01-01 01:10:00")
      mem.addData((t0, "click", 1.0), (t1, "click", 2.0), (t2, "view", 3.0))
      q.processAllAvailable()
      val got = spark.table("wc")
        .selectExpr("cast(window.start as string)", "event_type", "cnt")
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(
        ("2024-01-01 00:00:00", "click", 2L),
        ("2024-01-01 01:00:00", "view", 1L)))
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark bounds state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    // the streaming form of exact dedup for at-least-once upstreams:
    // duplicate keys within the watermark horizon collapse, and state
    // evicts past it — unlike plain dropDuplicates, whose state grows
    // with the whole stream's key space
    val q = mem.toDS().toDF("doc_id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("doc_id")
      .writeStream.format("memory").queryName("sdd").outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData((1L, t("2024-01-01 00:00:00")), (1L, t("2024-01-01 00:10:00")),
        (2L, t("2024-01-01 00:05:00")))
      q.processAllAvailable()
      mem.addData((1L, t("2024-01-01 00:20:00"))) // still within horizon → dup
      q.processAllAvailable()
      val got = spark.table("sdd").select("doc_id").as[Long].collect().toSeq.sorted
      assert(got == Seq(1L, 2L), s"got $got")
      assert(q.lastProgress.stateOperators.exists(
        _.operatorName.contains("dedupeWithinWatermark")),
        q.lastProgress.stateOperators.map(_.operatorName).mkString(","))
    } finally q.stop()
  }

  test("stream-stream interval join attributes within the bound, drops outside") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = ChangeStream.intervalJoin(
      clicks.toDS().toDF("user_id", "click_id", "click_ts"),
      buys.toDS().toDF("user_id", "buy_id", "buy_ts"),
      "user_id", "click_ts", "buy_ts", within = "1 HOUR")
      .select("user_id", "click_id", "buy_id")
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      clicks.addData((1L, 10L, t("2024-01-01 00:00:00")),
        (2L, 11L, t("2024-01-01 00:00:00")))
      buys.addData(
        (1L, 20L, t("2024-01-01 00:30:00")),  // within the hour → joins
        (1L, 21L, t("2024-01-01 02:00:00")),  // outside → dropped
        (2L, 22L, t("2023-12-31 23:59:00")))  // before the click → dropped
      q.processAllAvailable()
      val got = spark.table("ssj").as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 10L, 20L)))
      // the time bound is in the JOIN CONDITION, so the run uses the
      // symmetric hash join STATE operator (watermark-evictable) — an
      // unconstrained stream-stream join would refuse to plan in
      // append mode at all, but pin the state operator explicitly
      assert(q.lastProgress.stateOperators.exists(
        _.operatorName.contains("symmetricHashJoin")),
        q.lastProgress.stateOperators.map(_.operatorName).mkString(","))
    } finally q.stop()
  }

  test("intervalJoin batch algebra matches the naive model (seeded random)") {
    val rnd = new scala.util.Random(1405)
    (1 to 5).foreach { _ =>
      def evts(n: Int) = (0 until n).map { i =>
        (rnd.nextInt(4).toLong, i.toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(7200) * 1000L))
      }
      val ls = evts(40); val rs = evts(40)
      val got = ChangeStream.intervalJoin(
        ls.toDF("user_id", "l_id", "l_ts"), rs.toDF("user_id", "r_id", "r_ts"),
        "user_id", "l_ts", "r_ts", within = "30 MINUTES")
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      val want = (for {
        (lu, li, lt) <- ls; (ru, ri, rt) <- rs
        if lu == ru && rt.getTime >= lt.getTime &&
          rt.getTime <= lt.getTime + 30 * 60 * 1000L
      } yield (li, ri)).toSet
      assert(got == want)
    }
  }

  test("streaming session windows group by inactivity gap") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val df = mem.toDS().toDF("ts", "user_id")
    // session windows emit in append mode once the watermark passes the
    // session end — a second batch advances it
    val q = df.withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData(
        (t("2024-01-01 00:00:00"), 1L), (t("2024-01-01 00:10:00"), 1L), // session 1
        (t("2024-01-01 02:00:00"), 1L), // session 2 (gap > 30m)
        (t("2024-01-01 00:05:00"), 2L))
      q.processAllAvailable()
      mem.addData((t("2024-01-02 00:00:00"), 3L)) // watermark pusher
      q.processAllAvailable()
      val got = spark.table("sess").select("user_id", "cnt")
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(got == Map(1L -> Seq(1L, 2L), 2L -> Seq(1L))) // user 3 still open
    } finally q.stop()
  }

  test("compactedApply merges each micro-batch idempotently into a target") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[(Long, Long, String, String, String, Int, Double)]
    val changelog = mem.toDS().toDF("seq", "pk", "db", "tbl", "op", "r_k", "r_v")
      .selectExpr("seq", "pk", "tbl", "op", "pk as r_id", "r_k", "r_v")
    @volatile var state = Map[Long, Int]() // pk -> r_k
    // data must be present before start: AvailableNow snapshots offsets
    // at query start and terminates once they are processed
    mem.addData(
      (0L, 1L, "d", "t", "insert", 10, 1.0),
      (1L, 1L, "d", "t", "update", 11, 1.1),
      (2L, 2L, "d", "t", "insert", 20, 2.0))
    val q = ChangeStream.compactedApply(changelog, dir) { (net, _) =>
      net.collect().foreach { r =>
        val pk = r.getAs[Long]("pk")
        r.getAs[String]("net_op") match {
          case "delete" => state -= pk
          case _ => state += pk -> r.getAs[Int]("r_k")
        }
      }
    }
    q.awaitTermination(60000)
    assert(state == Map(1L -> 11, 2L -> 20))
  }

  test("streaming dedup admission: arriving docs vs static corpus bands") {
    // the incremental dedup path in its production shape: the corpus's
    // banded signatures are a STATIC table (checkpointed in production),
    // new documents arrive as a stream, and candidates come from a
    // stream-static equi-join on (band, key) — the same
    // Dedup.lshCandidatesAgainst algebra, unchanged, because every
    // operator here is stream-agnostic DataFrame algebra
    import graft.ops.{Dedup, TextAnalysis}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    def bandsOf(df: org.apache.spark.sql.DataFrame) = {
      val toks = TextAnalysis.tokens(col("text"))
      val sh = df.filter(size(toks) >= 3)
        .select($"doc_id", array_distinct(Dedup.shingles(toks)).as("sh"))
        .withColumn("sig", Dedup.minhashFast($"sh", 8).cast("array<string>"))
      Dedup.lshBands(sh, "sig", 4, 2, "doc_id")
    }
    val corpusBands = bandsOf(docs.filter($"doc_id" < 400)) // static side
    val mem = MemoryStream[(Long, String)]
    val arriving = mem.toDS().toDF("doc_id", "text")
    val q = Dedup.lshCandidatesAgainst(bandsOf(arriving), corpusBands, "doc_id")
      .writeStream.format("memory").queryName("admission").outputMode("append").start()
    try {
      // feed the >= 400 docs as two arriving micro-batches
      val newDocs = docs.filter($"doc_id" >= 400).as[(Long, String)].collect()
      val (b1, b2) = newDocs.partition(_._1 % 2 == 0)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("admission").as[(Long, Long)].collect().toSet
      // batch form of the identical algebra is the oracle
      val want = Dedup.lshCandidatesAgainst(
        bandsOf(docs.filter($"doc_id" >= 400)), corpusBands, "doc_id")
        .as[(Long, Long)].collect().toSet
      assert(want.nonEmpty, "fixture should contain cross-split near-dups")
      assert(got == want,
        "streamed admission must equal the batch form of the same algebra")
    } finally q.stop()
  }

  test("streaming corpus admission: self-growing store rejects cross-batch dups") {
    import graft.ops.Admission
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-admission")
    val cfg = Admission.Config(
      target = dir.resolve("store").toString,
      checkpoint = dir.resolve("ckpt").toString)
    def ids(): Seq[Long] =
      graft.ops.Admission.readStore(spark, cfg.target)
        .map(_.select("doc_id").as[Long].collect().toSeq.sorted).getOrElse(Seq.empty)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content about spark shuffles and parquet footers"
    val third = "a third unrelated document concerning bucketed state stores"

    val mem = MemoryStream[(Long, String)]
    val q = Admission.admissionStream(mem.toDS().toDF("doc_id", "text"), cfg,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      // batch 0: 11 duplicates 10 within the batch -> keep-first rejects 11
      mem.addData((10L, base), (11L, base), (12L, other))
      q.processAllAvailable()
      assert(ids() == Seq(10L, 12L))
      // batch 1: 20 duplicates ADMITTED doc 10 (cross-batch, via the
      // store); 21 is new — the store grows by exactly 21
      mem.addData((20L, base), (21L, third))
      q.processAllAvailable()
      assert(ids() == Seq(10L, 12L, 21L))
    } finally q.stop()
    // at-least-once redelivery of batch 1 (crash fell between the store
    // flip and the checkpoint commit): the already-flipped generation is
    // detected and the store converges unchanged
    Admission.admitBatch(
      Seq((20L, base), (21L, third)).toDF("doc_id", "text"), cfg, batchId = 1L)
    assert(ids() == Seq(10L, 12L, 21L))
  }

  test("stall watchdog flags a wedged query and clears when it progresses") {
    // the reference's stuck-pipe detector (disruptor.go:216-236): input
    // admitted, ack cursor frozen. Artificial stall: batch 0's sink
    // blocks on a latch, so no progress event lands within the horizon.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val wd = new graft.streaming.StallWatchdog(horizonMs = 500L)
    spark.streams.addListener(wd)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val q = mem.toDS().writeStream
      .foreachBatch { (_: org.apache.spark.sql.Dataset[Long], id: Long) =>
        if (id == 0L) gate.await(20, java.util.concurrent.TimeUnit.SECONDS)
        ()
      }.start()
    def pollUntil(deadlineMs: Long)(cond: => Boolean): Boolean = {
      val end = System.currentTimeMillis() + deadlineMs
      while (!cond && System.currentTimeMillis() < end) Thread.sleep(50)
      cond
    }
    try {
      mem.addData(1L)
      assert(pollUntil(10000)(wd.isStalled),
        "a query wedged inside a batch must trip the watchdog")
      gate.countDown() // un-wedge: the completing batch heartbeats
      q.processAllAvailable()
      assert(pollUntil(10000)(!wd.isStalled),
        "progress must clear the stall flag")
    } finally {
      gate.countDown()
      q.stop()
      spark.streams.removeListener(wd)
    }
    // terminated queries leave the watch set entirely
    assert(pollUntil(10000)(wd.stalled.isEmpty))
  }
}
