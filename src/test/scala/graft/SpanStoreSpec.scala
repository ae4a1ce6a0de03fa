package graft

import graft.ops.SpanStore

/** Incremental span-dedup store: novel-only growth, replay safety,
  * corpus/intra dup split. */
class SpanStoreSpec extends SparkSpec {
  import spark.implicits._

  private def words(p: String, n: Int) = (1 to n).map(p + _).mkString(" ")

  test("span admission: store grows by novel only; flipped replay is a no-op") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-spanstore")
    val cfg = SpanStore.Config(s"$tmp/store", chunkTokens = 8)
    val a8 = words("a", 8); val b8 = words("b", 8)
    val c8 = words("c", 8); val d8 = words("d", 8)

    val b1 = Seq((0L, s"$a8 $b8")).toDF("doc_id", "text")
    val s1 = SpanStore.admitBatch(b1, cfg, 0L)
      .select("doc_id", "n_chunks", "dup_chunks", "cross_dup_chunks", "kept_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(s1 == Seq((0L, 2L, 0L, 0L, s"$a8 $b8")))
    assert(SpanStore.readHashes(spark, cfg.target).get.count() == 2)

    // batch 2: a8 is a corpus dup; c8 appears twice (intra-batch,
    // cross-doc: doc 1 owns the first occurrence)
    val b2 = Seq((1L, s"$a8 $c8"), (3L, s"$c8 $c8")).toDF("doc_id", "text")
    val s2 = SpanStore.admitBatch(b2, cfg, 1L)
      .select("doc_id", "n_chunks", "dup_chunks", "cross_dup_chunks", "kept_text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(s2 == Seq((1L, 2L, 1L, 1L, c8), (3L, 2L, 2L, 2L, "")))
    // only c8 was novel
    assert(SpanStore.readHashes(spark, cfg.target).get.count() == 3)

    // replaying the already-flipped batch 1 must not change the store
    SpanStore.admitBatch(b1, cfg, 0L)
    assert(SpanStore.readHashes(spark, cfg.target).get.count() == 3)

    // a fresh batch after the replay still admits correctly
    val s3 = SpanStore.admitBatch(
      Seq((5L, s"$b8 $d8")).toDF("doc_id", "text"), cfg, 2L)
      .select("doc_id", "n_chunks", "dup_chunks", "cross_dup_chunks", "kept_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(s3 == Seq((5L, 2L, 1L, 1L, d8)))
    assert(SpanStore.readHashes(spark, cfg.target).get.count() == 4)
  }

  test("config-driven streaming span admission drains; restart is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-span-cfg")
    val cfg = s"""{
      "source": {"type": "documents_stream", "dir": "$sf", "slices": 3},
      "processors": [],
      "sink": {"type": "span_admit", "path": "${dir.resolve("store")}",
               "checkpoint": "${dir.resolve("ckpt")}", "chunkTokens": 8}
    }"""
    graft.pipeline.Pipeline.runStream(spark, cfg)
    val store = SpanStore.readHashes(spark, dir.resolve("store").toString).get
    val n = store.count()
    assert(n > 0)
    // the store holds exactly the corpus's distinct chunk set: slicing
    // only changes which batch owns a digest, never the union
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // distinct chunks = the batch-mode keeper count (kept = first
    // occurrence, exactly one per distinct chunk)
    val want = graft.ops.Dedup.chunkDedup(docs, "doc_id", "text", 8)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("n_chunks") -
          org.apache.spark.sql.functions.col("dup_chunks")))
      .head().getLong(0)
    assert(n == want, s"store has $n digests, corpus has $want distinct chunks")
    // restart from the same checkpoint: no new batches, store unchanged
    graft.pipeline.Pipeline.runStream(spark, cfg)
    assert(SpanStore.readHashes(spark, dir.resolve("store").toString)
      .get.count() == n)
  }
}
