package graft

import org.apache.spark.sql.functions._
import graft.source.Changelog
import graft.streaming.ChangeStream

/** Same-day tripwire for harness fixture drift (the r12 regression: the
  * driver regenerated `events.parquet` with a different physical `ts`
  * type and the failure stayed invisible for two rounds). These cases run
  * the batch AND stream events readers against the LIVE testdata dir and
  * value-check `event_time`, so a changed footer — or a silent
  * unit-mis-scale like the 1000× micros bug — fails `sbt test`
  * immediately rather than at the next driver round.
  */
class FixtureSmokeSpec extends SparkSpec {

  // Fixture events are generated in a recent-era window; a unit slip
  // (ns read as µs or vice versa) moves timestamps by ~1000× — out of
  // this band in either direction.
  private val loYear = 1990
  private val hiYear = 2100

  test("batch fromEvents reads the live fixture with sane event_time") {
    val log = Changelog.fromEvents(spark, sf)
    val row = log.agg(
      count(lit(1)).as("n"),
      min(year(col("event_time"))).as("y_min"),
      max(year(col("event_time"))).as("y_max")).head()
    assert(row.getLong(0) > 0, "fixture changelog is empty")
    assert(row.getInt(1) >= loYear && row.getInt(2) <= hiYear,
      s"event_time outside [$loYear,$hiYear] — timestamp unit drift: $row")
  }

  test("events ts/ts_ns normalization is self-consistent on the live fixture") {
    val e = Changelog.events(spark, sf)
    // compare at µs granularity: the legacy nanos shape legitimately
    // keeps sub-µs precision in ts_ns that ts (µs) truncates, so exact
    // ns equality would false-alarm on a supported fixture shape
    val bad = e.filter(unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad === 0, s"$bad rows where ts and ts_ns disagree at µs granularity")
  }

  test("stream fromEventsStream matches the batch derivation exactly") {
    val out = java.nio.file.Files.createTempDirectory("graft-fixture-smoke")
    val q = ChangeStream.fromEventsStream(spark, sf, slices = 2)
      .writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000),
      "bounded events-stream drain did not finish in 300s")
    val streamed = spark.read.parquet(s"$out/data")
    val batch = Changelog.fromEvents(spark, sf)
    // exact set equality, event_time included — a unit bug can't hide
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0,
      "streamed changelog has rows the batch derivation lacks (event_time drift?)")
    assert(batch.exceptAll(streamed).count() === 0,
      "batch changelog has rows the streamed derivation lacks")
  }
}
