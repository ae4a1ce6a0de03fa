package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.IvfIndex
import graft.sink.DeltaStore

/** The persisted IVF index: frozen coarse quantizer, cell-bucketed
  * postings, FILE-pruned probes, replay-safe appends. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecsOf(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      // deterministic spread-out unit-ish vectors, 8-dim
      (i.toLong, (0 until 8).map(d => math.sin(i * 31 + d * 7).toDouble))
    }.toDF("vec_id", "v")

  private def cfgAt(dir: String) = IvfIndex.Config(
    target = s"$dir/index", checkpoint = s"$dir/ckpt",
    cells = 4, portableSeeding = true)

  test("centroids freeze at batch 0; later batches assign against them") {
    val dir = Files.createTempDirectory("graft-ivf-freeze").toString
    val cfg = cfgAt(dir)
    IvfIndex.indexBatch(vecsOf(0 until 40), cfg, 0L)
    val frozen = Files.readAllBytes(java.nio.file.Paths.get(cfg.target, "CENTROIDS"))
    IvfIndex.indexBatch(vecsOf(40 until 80), cfg, 1L)
    val after = Files.readAllBytes(java.nio.file.Paths.get(cfg.target, "CENTROIDS"))
    assert(java.util.Arrays.equals(frozen, after),
      "a second batch must not re-seed the frozen quantizer")
    // every posting's cell is the nearest frozen centroid (ties: lowest)
    val cent = IvfIndex.readCentroids(spark, cfg.target).get.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val postings = DeltaStore.readAppendOnly(spark, cfg.target).get
      .select("vec_id", "v", "cell").collect()
    assert(postings.length === 80)
    postings.foreach { r =>
      val v = r.getSeq[Double](1)
      val best = cent.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, d) => (d, -c) }._1
      assert(r.getLong(2) === best, s"vec ${r.getLong(0)} in wrong cell")
    }
  }

  test("ANN-assisted batch assignment (superCells) keeps every posting on its nearest frozen cell") {
    // superCells=1 routes through one super-group = exact brute
    // assignment; the store a hier-configured stream builds must obey
    // the same nearest-cell invariant the brute path pins above
    val dir = Files.createTempDirectory("graft-ivf-hier").toString
    val cfg = cfgAt(dir).copy(superCells = 1)
    IvfIndex.indexBatch(vecsOf(0 until 40), cfg, 0L)
    IvfIndex.indexBatch(vecsOf(40 until 80), cfg, 1L)
    val cent = IvfIndex.readCentroids(spark, cfg.target).get.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val postings = DeltaStore.readAppendOnly(spark, cfg.target).get
      .select("vec_id", "v", "cell").collect()
    assert(postings.length === 80)
    postings.foreach { r =>
      val v = r.getSeq[Double](1)
      val best = cent.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, d) => (d, -c) }._1
      assert(r.getLong(2) === best, s"vec ${r.getLong(0)} in wrong cell")
    }
  }

  test("probed serve reads ONLY the probed cells' files") {
    val dir = Files.createTempDirectory("graft-ivf-prune").toString
    val cfg = cfgAt(dir)
    IvfIndex.indexBatch(vecsOf(0 until 60), cfg, 0L)
    // bucket dirs = cells actually populated
    val allCells = DeltaStore.readManifest(cfg.target).keySet
    assert(allCells.size > 1, "fixture must populate several cells")
    val probe = Set(allCells.min)
    val pruned = DeltaStore.readAppendOnly(spark, cfg.target, Some(probe)).get
    pruned.inputFiles.foreach(f =>
      assert(f.contains(s"bucket=${allCells.min}"),
        s"pruned scan leaked a non-probed file: $f"))
    // nprobe=1 serve ranks within the query's single best cell only —
    // equal to brute-force top-k restricted to that cell's members
    val queries = vecsOf(0 until 3)
    val served = IvfIndex.serve(spark, cfg.target, queries, k = 3, nprobe = 1)
      .select("qid", "rank", "nid").as[(Long, Long, Long)].collect().toSet
    val cent = IvfIndex.readCentroids(spark, cfg.target).get
    val qcells = graft.ops.Similarity
      .assignCells(queries, cent, "qid", "qv", probes = 1, "vec_id", "v")
      .select("qid", "cell").as[(Long, Long)].collect().toMap
    val byCell = DeltaStore.readAppendOnly(spark, cfg.target).get
      .select("vec_id", "v", "cell").collect()
      .groupBy(_.getLong(2))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expect = (0 until 3).flatMap { qi =>
      val qv = (0 until 8).map(d => math.sin(qi * 31 + d * 7).toDouble)
      byCell(qcells(qi.toLong)).toSeq
        .filter(_.getLong(0) != qi.toLong)
        .map(r => (r.getLong(0), cos(qv, r.getSeq[Double](1))))
        .sortBy { case (nid, c) => (-c, nid) }.take(3).zipWithIndex
        .map { case ((nid, _), rk) => (qi.toLong, rk + 1L, nid) }
    }.toSet
    assert(served === expect)
  }

  test("replaying an applied batch neither duplicates nor re-seeds") {
    val dir = Files.createTempDirectory("graft-ivf-replay").toString
    val cfg = cfgAt(dir)
    IvfIndex.indexBatch(vecsOf(0 until 30), cfg, 0L)
    IvfIndex.indexBatch(vecsOf(30 until 50), cfg, 1L)
    val before = DeltaStore.readAppendOnly(spark, cfg.target).get.count()
    IvfIndex.indexBatch(vecsOf(30 until 50), cfg, 1L) // at-least-once redelivery
    val after = DeltaStore.readAppendOnly(spark, cfg.target).get.count()
    assert(before === 50L && after === 50L)
  }

  test("optimize merges chains to one generation; serve and pruning unchanged") {
    val dir = Files.createTempDirectory("graft-ivf-opt").toString
    val cfg = cfgAt(dir)
    // 4 increments → every touched cell's chain is multiple generations
    (0 until 4).foreach(b =>
      IvfIndex.indexBatch(vecsOf(b * 25 until (b + 1) * 25), cfg, b.toLong))
    val queries = vecsOf(0 until 3)
    val before = IvfIndex.serve(spark, cfg.target, queries, k = 5).collect().toSet
    val filesBefore = DeltaStore.readAppendOnly(spark, cfg.target).get.inputFiles.length
    val chainsBefore = DeltaStore.readManifest(cfg.target)
    assert(chainsBefore.values.exists(_.size > 1), "test needs multi-gen chains")

    graft.Run.dispatch(spark, s"""{"maintenance":
      {"type": "optimize", "path": "${cfg.target}"}}""")

    val chainsAfter = DeltaStore.readManifest(cfg.target)
    assert(chainsAfter.nonEmpty && chainsAfter.values.forall(c =>
      c.size == 1 && c.head.startsWith("snap-")),
      s"optimize did not merge chains: $chainsAfter")
    val filesAfter = DeltaStore.readAppendOnly(spark, cfg.target).get.inputFiles.length
    assert(filesAfter < filesBefore,
      s"optimize must reduce files: $filesBefore -> $filesAfter")
    // rows verbatim, serve identical, cell-pruned reads still correct
    assert(IvfIndex.serve(spark, cfg.target, queries, k = 5).collect().toSet === before)
    assert(DeltaStore.readAppendOnly(spark, cfg.target).get.count() === 100)
    // floor recorded; a replayed optimize at the same applied id is a no-op
    assert(DeltaStore.readHistoryFloor(cfg.target) === DeltaStore.readApplied(cfg.target))
    DeltaStore.optimizeAppendOnly(spark, cfg.target)
    assert(DeltaStore.readManifest(cfg.target) === chainsAfter)
  }

  test("offline snapshot refuses a semantically-bucketed store") {
    val dir = Files.createTempDirectory("graft-ivf-snap").toString
    val cfg = cfgAt(dir)
    IvfIndex.indexBatch(vecsOf(0 until 30), cfg, 0L)
    val e = intercept[IllegalArgumentException] {
      DeltaStore.snapshot(spark, cfg.target, cfg.cells)
    }
    assert(e.getMessage.contains("BUCKETBY"),
      "snapshot must refuse: re-bucketing by pk hash would break pruning")
  }

  test("PQ leg: one-batch servePq equals the one-shot IVF+PQ path") {
    // one batch = the whole corpus, so the frozen quantizer AND frozen
    // codebook coincide with what ivfPqTopK trains one-shot — serving
    // from the store must reproduce its ranks exactly
    val dir = Files.createTempDirectory("graft-ivf-pq").toString
    val cfg = cfgAt(dir).copy(pqM = 2, pqK = 4, pqIters = 1,
      trainSample = 64)
    val corpus = vecsOf(0 until 60)
    IvfIndex.indexBatch(corpus, cfg, 0L)
    val queries = vecsOf(0 until 4)
    val served = IvfIndex.servePq(spark, cfg.target, queries, topK = 3,
        nprobe = 2)
      .select("qid", "rank", "nid").orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val oneShot = graft.ops.Similarity.ivfPqTopK(corpus, queries, topK = 3,
        cells = cfg.cells, nprobe = 2, m = 2, k = 4, pqIters = 1,
        portableSeeding = true, trainSample = 64)
      .select("qid", "rank", "nid").orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(served.nonEmpty && served.toSeq === oneShot.toSeq,
      s"served ${served.toSeq} vs one-shot ${oneShot.toSeq}")
  }

  test("PQ leg: codebook freezes at batch 0; a plain store refuses servePq") {
    val dir = Files.createTempDirectory("graft-ivf-pqfreeze").toString
    val cfg = cfgAt(dir).copy(pqM = 2, pqK = 4, trainSample = 64)
    IvfIndex.indexBatch(vecsOf(0 until 40), cfg, 0L)
    val frozen = Files.readAllBytes(
      java.nio.file.Paths.get(cfg.target, "PQCODEBOOK"))
    IvfIndex.indexBatch(vecsOf(40 until 80), cfg, 1L)
    assert(java.util.Arrays.equals(frozen, Files.readAllBytes(
      java.nio.file.Paths.get(cfg.target, "PQCODEBOOK"))),
      "a second batch must not re-train the frozen codebook")
    // postings of BOTH batches carry codes from the frozen codebook
    val stored = DeltaStore.readAppendOnly(spark, cfg.target).get
    assert(stored.columns.contains("codes"))
    assert(stored.filter(size(col("codes")) =!= 2).count() === 0)
    // a store built WITHOUT the PQ leg refuses loudly
    val plain = Files.createTempDirectory("graft-ivf-plain").toString
    val pcfg = cfgAt(plain)
    IvfIndex.indexBatch(vecsOf(0 until 20), pcfg, 0L)
    val e = intercept[IllegalStateException] {
      IvfIndex.servePq(spark, pcfg.target, vecsOf(0 until 2), topK = 2)
    }
    assert(e.getMessage.contains("PQCODEBOOK"))
  }

  test("metaCols land in the postings; filtered serve ranks only qualifying neighbors") {
    val dir = Files.createTempDirectory("graft-ivf-filt").toString
    val cfg = cfgAt(dir).copy(metaCols = Seq("label"))
    val withLabel = vecsOf(0 until 40).withColumn("label",
      (col("vec_id") % 3).cast("int"))
    IvfIndex.indexBatch(withLabel, cfg, 0L)
    val stored = DeltaStore.readAppendOnly(spark, cfg.target).get
    assert(stored.columns.contains("label"))
    assert(stored.count() === 40)
    val queries = vecsOf(0 until 3)
    val filtered = IvfIndex.serve(spark, cfg.target, queries, k = 5,
      nprobe = 4, filter = Some(col("label") === 1)).collect()
    assert(filtered.nonEmpty)
    // every returned neighbor satisfies the predicate (vec_id % 3 == 1)
    assert(filtered.forall(_.getAs[Long]("nid") % 3 == 1))
    // nprobe = cells (4): the probed set is the whole index, so the
    // filtered serve must equal brute-force top-k over the qualifying
    // corpus — the pre-filter semantic, value-checked
    val brute = graft.ops.Similarity.bruteTopK(
      withLabel.filter(col("label") === 1).select("vec_id", "v"),
      queries, k = 5).select("qid", "rank", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = filtered.map(r => (r.getAs[Long]("qid"),
      r.getAs[Long]("rank"), r.getAs[Long]("nid"))).toSet
    assert(got == brute)
    // unfiltered serve on the same store is unaffected by the metadata
    val plain = IvfIndex.serve(spark, cfg.target, queries, k = 3,
      nprobe = 4).collect()
    assert(plain.exists(_.getAs[Long]("nid") % 3 != 1))
  }
}
