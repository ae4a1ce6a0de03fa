package graft

import graft.ops.{Admission, Dedup}
import graft.sink.BucketStore

/** The persisted banded form of the admission store: candidate
  * generation reads pre-derived (doc_id, band, key) rows instead of
  * re-deriving bands from stored signatures every batch. */
class AdmissionSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private val other = "completely different content about spark shuffles and parquet footers"
  private val third = "a third unrelated document concerning bucketed state stores"

  private def cfgIn(prefix: String): Admission.Config = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Admission.Config(target = dir.resolve("store").toString,
      checkpoint = dir.resolve("ckpt").toString)
  }

  private def storedIds(cfg: Admission.Config): Set[Long] =
    BucketStore.read(spark, cfg.target)
      .map(_.select("doc_id").as[Long].collect().toSet).getOrElse(Set.empty)

  private def bandRows(cfg: Admission.Config): Set[(Long, Int, String)] =
    BucketStore.read(spark, cfg.bandTarget)
      .map(_.select("doc_id", "band", "key").as[(Long, Int, String)]
        .collect().toSet).getOrElse(Set.empty)

  /** What the band store must always contain: the banded form of the
    * signature store, exactly. */
  private def wantBands(cfg: Admission.Config): Set[(Long, Int, String)] =
    Dedup.lshBands(BucketStore.read(spark, cfg.target).get,
      "sig", cfg.bands, cfg.rows, "doc_id")
      .as[(Long, Int, String)].collect().toSet

  test("admission persists band rows and rejects cross-batch dups through them") {
    val cfg = cfgIn("graft-adm-bands")
    Admission.admitBatch(Seq((1L, base), (2L, other)).toDF("doc_id", "text"), cfg, 0L)
    assert(bandRows(cfg) == wantBands(cfg))
    assert(bandRows(cfg).map(_._1) == Set(1L, 2L))
    assert(bandRows(cfg).size == 2 * cfg.bands)
    // doc 3 duplicates ADMITTED doc 1: its candidate pair comes from the
    // banded store now; doc 4 is new and its bands are appended
    Admission.admitBatch(Seq((3L, base), (4L, third)).toDF("doc_id", "text"), cfg, 1L)
    assert(storedIds(cfg) == Set(1L, 2L, 4L))
    assert(bandRows(cfg) == wantBands(cfg))
    assert(bandRows(cfg).map(_._1) == Set(1L, 2L, 4L))
  }

  test("a store predating the banded form is backfilled on its next batch") {
    val cfg = cfgIn("graft-adm-upgrade")
    Admission.admitBatch(Seq((1L, base), (2L, other)).toDF("doc_id", "text"), cfg, 0L)
    // simulate a store written before the banded form existed
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(cfg.bandTarget))
    assert(bandRows(cfg).isEmpty)
    // the next batch still dedupes against the full corpus (bands derived
    // from signatures one last time) AND leaves the band store complete —
    // a partial backfill of only the new docs would silently blind every
    // later batch to the pre-upgrade corpus
    Admission.admitBatch(Seq((3L, base), (4L, third)).toDF("doc_id", "text"), cfg, 1L)
    assert(storedIds(cfg) == Set(1L, 2L, 4L))
    assert(bandRows(cfg) == wantBands(cfg))
    assert(bandRows(cfg).map(_._1) == Set(1L, 2L, 4L))
  }

  test("at-least-once redelivery converges with the split band-store flip") {
    val cfg = cfgIn("graft-adm-replay")
    Admission.admitBatch(Seq((1L, base), (2L, other)).toDF("doc_id", "text"), cfg, 0L)
    Admission.admitBatch(Seq((3L, base), (4L, third)).toDF("doc_id", "text"), cfg, 1L)
    val (ids, bands) = (storedIds(cfg), bandRows(cfg))
    // crash fell between the stores' flips and the checkpoint commit:
    // the whole batch replays; both generation-keyed merges must detect
    // their already-flipped generations and the pair must converge
    Admission.admitBatch(Seq((3L, base), (4L, third)).toDF("doc_id", "text"), cfg, 1L)
    assert(storedIds(cfg) == ids)
    assert(bandRows(cfg) == bands)
  }
}
