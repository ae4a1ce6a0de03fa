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

  test("a store refuses a batch whose chunking mismatches its stamp") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-span-params")
    val cfg = SpanStore.Config(s"$tmp/store", chunkTokens = 8)
    SpanStore.admitBatch(Seq((1L, words("a", 16))).toDF("doc_id", "text"), cfg, 0L)
    // different width: digests never collide — must die up front
    val e = intercept[IllegalArgumentException] {
      SpanStore.admitBatch(Seq((2L, words("a", 16))).toDF("doc_id", "text"),
        cfg.copy(chunkTokens = 4), 1L)
    }
    assert(e.getMessage.contains("chunker=fixed tokens=8"))
    assert(e.getMessage.contains("chunker=fixed tokens=4"))
    // different chunker family, same refusal
    val e2 = intercept[IllegalArgumentException] {
      SpanStore.admitBatch(Seq((2L, words("a", 16))).toDF("doc_id", "text"),
        cfg.copy(cdcCutNibbles = "01"), 1L)
    }
    assert(e2.getMessage.contains("chunker=cdc"))
  }

  test("params are stamped BEFORE the first append — a crashed append still guards") {
    // the ADVICE-flagged window: a crash between the store flip and a
    // post-append stamp left a non-empty UNSTAMPED store that a restart
    // under different params would silently mix digest families into.
    // Stamping first closes it: even a batch whose append never flips
    // (empty batch — zero generations) pins the chunking params.
    val tmp = java.nio.file.Files.createTempDirectory("graft-span-prestamp")
    val cfg = SpanStore.Config(s"$tmp/store", chunkTokens = 8)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    SpanStore.admitBatch(empty, cfg, 0L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cfg.target, "SPANPARAMS")))
    // the store itself may not exist yet, but the retry under different
    // params is already refused
    val e = intercept[IllegalArgumentException] {
      SpanStore.admitOnly(Seq((1L, words("a", 16))).toDF("doc_id", "text"),
        cfg.copy(chunkTokens = 4), 1L)
    }
    assert(e.getMessage.contains("chunker=fixed tokens=8"))
  }

  test("CDC-chunked store admits shift-robustly across batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-span-cdc")
    val cfg = SpanStore.Config(s"$tmp/store", cdcCutNibbles = "01")
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    SpanStore.admitBatch(Seq((1L, base)).toDF("doc_id", "text"), cfg, 0L)
    // batch 2: the same document with one token prepended — all CDC
    // segments after the first boundary dedup against the store
    val s2 = SpanStore.admitBatch(
      Seq((2L, s"zz $base")).toDF("doc_id", "text"), cfg, 1L)
      .select("n_chunks", "cross_dup_chunks").as[(Long, Long)].head()
    assert(s2._2 >= s2._1 - 2, s"CDC store should re-align: $s2")
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
