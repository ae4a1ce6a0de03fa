package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.{Dedup, SpanStore}

/** Property checks for span dedup: the distributed chunk/keeper/rebuild
  * pipeline against a driver-side model over random corpora built from
  * a small phrase pool (so cross-doc chunk collisions actually occur),
  * and the incremental store form against the same model split into
  * two batches. */
class SpanPropSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4 // chunk width under test

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  // a pool of aligned phrases (exactly K tokens) plus random tails —
  // docs collide at chunk granularity by construction
  private val phrasePool: Vector[String] =
    Vector("a b c d", "e f g h", "i j k l", "m n o p",
      "q r s t", "u v w x", "y z aa bb", "cc dd ee ff")

  private val docGen: Gen[String] = for {
    nseg <- Gen.choose(1, 5)
    segs <- Gen.listOfN(nseg, Gen.oneOf(phrasePool))
    tailLen <- Gen.choose(0, K - 1)
    tail <- Gen.listOfN(tailLen, Gen.oneOf("t1", "t2", "t3"))
  } yield (segs ++ (if (tail.isEmpty) Nil else List(tail.mkString(" ")))).mkString(" ")

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 16)
    ids <- Gen.pick(n, 0L until 40L)
    texts <- Gen.listOfN(n, docGen)
  } yield ids.toList.sorted.zip(texts)

  /** Driver-side model of [[Dedup.chunkDedup]]: (id → (n, dup, cross,
    * keptText)) with `seen` pre-seeded by an optional corpus set. */
  private def model(docs: List[(Long, String)],
      corpus: Set[String]): Map[Long, (Long, Long, Long, String)] = {
    val seen = scala.collection.mutable.Map.empty[String, Long] // chunk → owner id
    docs.sortBy(_._1).map { case (id, text) =>
      val chunks = text.trim.split(" +").toList.grouped(K).map(_.mkString(" ")).toList
      var dup = 0L; var cross = 0L
      val kept = chunks.flatMap { c =>
        if (corpus(c)) { dup += 1; cross += 1; None }
        else seen.get(c) match {
          case Some(owner) => dup += 1; if (owner != id) cross += 1; None
          case None => seen(c) = id; Some(c)
        }
      }
      id -> ((chunks.size.toLong, dup, cross, kept.mkString(" ")))
    }.toMap
  }

  test("chunkDedup matches the corpus-order first-occurrence model") {
    val prop = Prop.forAll(corpusGen) { docs =>
      val got = Dedup.chunkDedup(docs.toDF("doc_id", "text"), "doc_id", "text", K)
        .select("doc_id", "n_chunks", "dup_chunks", "cross_dup_chunks", "kept_text")
        .as[(Long, Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      got == model(docs, Set.empty)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("incremental store form equals the model seeded with batch 1's chunks") {
    val prop = Prop.forAll(corpusGen) { docs =>
      val (b1, b2) = docs.partition(_._1 % 2 == 0)
      (b1.isEmpty || b2.isEmpty) || {
        val tmp = java.nio.file.Files.createTempDirectory("graft-span-prop")
        try {
          val cfg = SpanStore.Config(s"$tmp/store", chunkTokens = K, nBuckets = 4)
          SpanStore.admitBatch(b1.toDF("doc_id", "text"), cfg, 0L)
          val got = SpanStore.admitBatch(b2.toDF("doc_id", "text"), cfg, 1L)
            .select("doc_id", "n_chunks", "dup_chunks", "cross_dup_chunks", "kept_text")
            .as[(Long, Long, Long, Long, String)].collect()
            .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
          val b1Chunks = b1.flatMap { case (_, t) =>
            t.trim.split(" +").toList.grouped(K).map(_.mkString(" ")) }.toSet
          got == model(b2, b1Chunks)
        } finally rmTree(tmp.toFile)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
