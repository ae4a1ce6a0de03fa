package graft

import java.nio.file.Files
import graft.model.Footprint

/** Proves the footprint guard actually trips on a regenerated table with
  * a changed column type — the deliberate-breakage case the r12 blind
  * spot demanded (a fixture drift must fail/flag the SAME day, not two
  * rounds later). */
class FootprintSpec extends SparkSpec {
  import spark.implicits._

  test("records a footprint, quiet when nothing drifts") {
    val dir = Files.createTempDirectory("graft-fp-data").toString
    val fp = Files.createTempDirectory("graft-fp").resolve("footprint.txt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Footprint.check(spark, dir, fp).isEmpty)       // first sighting
    assert(Footprint.check(spark, dir, fp).isEmpty)       // stable re-check
    val base = new java.io.File(dir).getName
    val recorded = new String(Files.readAllBytes(java.nio.file.Paths.get(fp)))
    assert(recorded.contains(s"$base/t = id:BIGINT,s:STRING"))
  }

  test("flags a type change on regeneration, then re-baselines") {
    val dir = Files.createTempDirectory("graft-fp-data2").toString
    val fp = Files.createTempDirectory("graft-fp2").resolve("footprint.txt").toString
    // round N: ts carried as a long (the legacy nanos shape)
    Seq((1L, 1700000000000000000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(Footprint.check(spark, dir, fp).isEmpty)
    // round N+1: harness regenerates with ts as a timestamp — the r12 drift
    Seq((1L, java.sql.Timestamp.valueOf("2026-01-02 03:04:05")))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val drifts = Footprint.check(spark, dir, fp)
    assert(drifts.size === 1)
    val (t, old, cur) = drifts.head
    assert(t === "events")
    assert(old.contains("ts:BIGINT") && cur.contains("ts:TIMESTAMP"))
    // after the flag the new truth is the baseline: quiet again
    assert(Footprint.check(spark, dir, fp).isEmpty)
  }

  test("an unreadable table records UNREADABLE instead of crashing the guard") {
    val dir = Files.createTempDirectory("graft-fp-bad").toString
    val fp = Files.createTempDirectory("graft-fp-bad2").resolve("footprint.txt").toString
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(s"$dir/ok.parquet")
    // a "parquet" file Spark cannot read at all — the r12 lesson's dual:
    // the drift guard must shout about a weird fixture, never die on one
    Files.write(java.nio.file.Paths.get(s"$dir/broken.parquet"),
      "not parquet at all".getBytes("UTF-8"))
    val drifts = Footprint.check(spark, dir, fp) // must not throw
    assert(drifts.isEmpty) // first sighting records, no drift yet
    val base = new java.io.File(dir).getName
    val recorded = new String(Files.readAllBytes(java.nio.file.Paths.get(fp)))
    assert(recorded.contains(s"$base/ok = id:BIGINT,s:STRING"))
    assert(recorded.contains(s"$base/broken = UNREADABLE("))
  }

  test("drift leaves a persistent .drift trace; no-rebaseline mode keeps failing") {
    val dir = Files.createTempDirectory("graft-fp-trace").toString
    val fp = Files.createTempDirectory("graft-fp-trace2").resolve("fp.txt").toString
    Seq((1L, 2L)).toDF("event_id", "ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    assert(Footprint.check(spark, dir, fp).isEmpty)
    Seq((1L, "s")).toDF("event_id", "ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    // pure compare: flags, does NOT re-baseline — a second run still flags
    assert(Footprint.check(spark, dir, fp, rebaseline = false).size === 1)
    assert(Footprint.check(spark, dir, fp, rebaseline = false).size === 1)
    // the drift trace persists next to the footprint
    val trace = new String(Files.readAllBytes(java.nio.file.Paths.get(fp + ".drift")))
    assert(trace.contains("events") && trace.contains("ts:BIGINT"))
    // re-baselining mode flags once, then the new truth is the baseline
    assert(Footprint.check(spark, dir, fp).size === 1)
    assert(Footprint.check(spark, dir, fp).isEmpty)
  }

  test("a recorded table deleted from disk reports MISSING drift") {
    val dir = Files.createTempDirectory("graft-fp-gone").toString
    val fp = Files.createTempDirectory("graft-fp-gone2").resolve("fp.txt").toString
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(s"$dir/keep.parquet")
    Seq((2L, "b")).toDF("id", "s").write.mode("overwrite").parquet(s"$dir/gone.parquet")
    assert(Footprint.check(spark, dir, fp).isEmpty)
    // harness deletes/renames a fixture between rounds
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(s"$dir/gone.parquet"))
    val drifts = Footprint.check(spark, dir, fp, rebaseline = false)
    assert(drifts === Seq(("gone", "id:BIGINT,s:STRING", "MISSING")))
    // pure-compare keeps flagging; rebaseline flags once then drops it
    assert(Footprint.check(spark, dir, fp, rebaseline = false).size === 1)
    assert(Footprint.check(spark, dir, fp).size === 1)
    assert(Footprint.check(spark, dir, fp).isEmpty)
  }

  test("two sf dirs with divergent schemas keep independent baselines") {
    val dirA = Files.createTempDirectory("graft-fp-dirA").toString
    val dirB = Files.createTempDirectory("graft-fp-dirB").toString
    val fp = Files.createTempDirectory("graft-fp-dirs").resolve("fp.txt").toString
    // same table name, DIFFERENT schema per dir — the flapping case
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(s"$dirA/t.parquet")
    Seq((1L, 2.0)).toDF("id", "v").write.mode("overwrite").parquet(s"$dirB/t.parquet")
    assert(Footprint.check(spark, dirA, fp).isEmpty)
    assert(Footprint.check(spark, dirB, fp).isEmpty) // would have flapped pre-namespacing
    // alternating runs stay quiet AND neither rebaseline clobbers the other
    assert(Footprint.check(spark, dirA, fp).isEmpty)
    assert(Footprint.check(spark, dirB, fp).isEmpty)
    val recorded = new String(Files.readAllBytes(java.nio.file.Paths.get(fp)))
    assert(recorded.contains(s"${new java.io.File(dirA).getName}/t = id:BIGINT,s:STRING"))
    assert(recorded.contains(s"${new java.io.File(dirB).getName}/t = id:BIGINT,v:DOUBLE"))
  }

  test("legacy un-namespaced baseline lines still compare, then migrate") {
    val dir = Files.createTempDirectory("graft-fp-legacy").toString
    val fp = Files.createTempDirectory("graft-fp-legacy2").resolve("fp.txt").toString
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(s"$dir/t.parquet")
    // a pre-namespacing committed baseline
    Files.write(java.nio.file.Paths.get(fp), "t = id:BIGINT,s:STRING".getBytes("UTF-8"))
    assert(Footprint.check(spark, dir, fp, rebaseline = false).isEmpty)
    // legacy line with a DIFFERENT type must still trip the guard
    Files.write(java.nio.file.Paths.get(fp), "t = id:INT,s:STRING".getBytes("UTF-8"))
    assert(Footprint.check(spark, dir, fp).size === 1)
    // ...and the rebaseline migrated it to the namespaced form
    val recorded = new String(Files.readAllBytes(java.nio.file.Paths.get(fp)))
    assert(recorded.contains(s"${new java.io.File(dir).getName}/t = id:BIGINT,s:STRING"))
    assert(!recorded.contains("\nt = ") && !recorded.startsWith("t = "))
  }

  test("normalizeTs rejects an unsupported physical type loudly") {
    val bad = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException] {
      graft.source.Changelog.normalizeTs(bad)
    }
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("live testdata footprint matches the committed record") {
    // the committed TESTDATA_FOOTPRINT.txt is the cross-round memory.
    // PURE compare (rebaseline = false): on drift this keeps failing
    // every run until the new truth is deliberately re-recorded (run
    // Verify, or Footprint.check with rebaseline) and committed — a
    // re-baselining spec would self-silence on its second run.
    val path = Footprint.defaultPath()
    // guard the guard: pure-compare against a MISSING baseline compares
    // against nothing and would pass vacuously forever
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      s"committed footprint not found at $path — the drift guard is blind; " +
        "run graft.Verify (or Footprint.check with rebaseline) and commit it")
    val drifts = Footprint.check(spark, sf, path, rebaseline = false)
    assert(drifts.isEmpty,
      s"harness testdata drifted since last recorded footprint: $drifts")
  }
}
