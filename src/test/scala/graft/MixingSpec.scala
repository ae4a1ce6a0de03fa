package graft

import org.apache.spark.sql.functions._
import graft.ops.Mixing

/** Corpus composition: deterministic stratified sampling and
  * shard-parallel sequence packing. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select($"doc_id", $"lang", $"text")

  test("sampleByRate: deterministic, boundary rates exact, subsets monotone") {
    val total = docs.count()
    // rate 1.0 keeps everything, 0.0 keeps nothing
    assert(Mixing.sampleByRate(docs, "lang", "doc_id", Map.empty).count() == total)
    assert(Mixing.sampleByRate(docs, "lang", "doc_id",
      Map.empty, default = 0.0).count() == 0)
    // deterministic: the same call twice keeps the identical id set
    def ids(rate: Double): Set[Long] =
      Mixing.sampleByRate(docs, "lang", "doc_id", Map("en" -> rate))
        .filter($"lang" === "en").select("doc_id").as[Long].collect().toSet
    assert(ids(0.5) == ids(0.5))
    // monotone: lowering a rate keeps a SUBSET (the re-mix-as-delete
    // property — a rate change must never reshuffle which docs survive)
    assert(ids(0.25).subsetOf(ids(0.5)) && ids(0.5).subsetOf(ids(0.75)))
    // the kept fraction tracks the rate (hash-slice uniformity)
    val en = docs.filter($"lang" === "en").count().toDouble
    val frac = ids(0.5).size / en
    assert(frac > 0.35 && frac < 0.65, s"kept fraction $frac far from rate 0.5")
  }

  test("packByOffset: every doc in exactly one pack, offsets gapless, packs aligned") {
    val withToks = docs.select($"doc_id",
      size(split(trim($"text"), " +")).cast("long").as("toks"))
    val packed = Mixing.packByOffset(withToks, "doc_id", "toks",
      ctxTokens = 256, nShards = 4).cache()
    try {
      // one output row per input doc (nothing lost, nothing duplicated)
      assert(packed.count() == withToks.count())
      assert(packed.select("doc_id").distinct().count() == withToks.count())
      val rows = packed.select("doc_id", "toks", "shard", "start_off", "pack_id")
        .as[(Long, Long, Int, Long, Long)].collect()
      rows.groupBy(_._3).foreach { case (_, shardRows) =>
        val ordered = shardRows.sortBy(_._1)
        // gapless layout: each doc starts where the previous one ended
        ordered.foldLeft(0L) { case (expected, (_, toks, _, off, _)) =>
          assert(off == expected, s"offset gap: $off != $expected")
          expected + toks
        }
        // pack assignment is exactly the boundary the offset lands in
        ordered.foreach { case (_, _, shard, off, pack) =>
          assert(pack == (shard.toLong << 42) + off / 256)
        }
        // docs within a pack are contiguous in id order
        val packsInOrder = ordered.map(_._5)
        assert(packsInOrder.sameElements(packsInOrder.sorted),
          "pack ids must be non-decreasing along the shard layout")
      }
      // production default (xxhash64 sharding) holds the same invariants
      val prod = Mixing.packByOffset(withToks, "doc_id", "toks",
        ctxTokens = 256, nShards = 4)
      assert(prod.count() == withToks.count())
    } finally { packed.unpersist(); () }
  }

  test("rangeLayout: contiguous, count-balanced, whole keys, bounded-key guard") {
    val full = spark.read.parquet(s"$sf/documents.parquet")
    val laid = Mixing.rangeLayout(full, "n_chars", 8)
    val stats = laid.groupBy("grp")
      .agg(count(lit(1)).as("n"), min("n_chars").as("lo"), max("n_chars").as("hi"))
      .orderBy("grp").collect()
    assert(stats.length === 8, "500 docs over 311 keys must fill all 8 groups")
    // contiguity: ranges strictly ordered, no overlap
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) < b.getLong(2),
        s"group ${a.getLong(0)} hi ${a.getLong(3)} overlaps ${b.getLong(0)} lo ${b.getLong(2)}")
    }
    // whole keys: a key value never splits across groups
    assert(laid.groupBy("n_chars").agg(countDistinct("grp").as("g"))
      .filter($"g" > 1).count() === 0L)
    // balance: within one max-key-count of the fair share on both sides
    val total = stats.map(_.getLong(1)).sum
    val maxKey = full.groupBy("n_chars").count().agg(max("count")).head().getLong(0)
    val share = total / 8
    stats.foreach { r =>
      assert(r.getLong(1) <= share + maxKey && r.getLong(1) + maxKey >= share,
        s"group ${r.getLong(0)} count ${r.getLong(1)} vs share $share (maxKey $maxKey)")
    }
    // determinism
    assert(Mixing.rangeLayout(full, "n_chars", 8).groupBy("grp").count()
      .orderBy("grp").collect().toSeq ===
      laid.groupBy("grp").count().orderBy("grp").collect().toSeq)
    // unbounded keys refused fast (quantize-first contract)
    val e = intercept[IllegalArgumentException] {
      Mixing.rangeLayout(full, "doc_id", 4, maxDistinct = 100)
    }
    assert(e.getMessage.contains("quantize"))
  }

  test("rangeLayout degenerate cases: fewer keys than groups, one group") {
    // 2 distinct keys, 4 groups: every row still assigned, whole keys,
    // contiguous — skipped groups are allowed, splits are not
    val two = Seq.fill(30)(10L).union(Seq.fill(10)(99L)).toDF("k")
    val laid = Mixing.rangeLayout(two, "k", 4)
    assert(laid.count() === 40L)
    val byKey = laid.groupBy("k").agg(countDistinct("grp").as("g"),
      min("grp").as("lo")).orderBy("k").collect()
    assert(byKey.forall(_.getLong(1) === 1L), "whole keys only")
    val g10 = byKey(0).getLong(2); val g99 = byKey(1).getLong(2)
    // 30 of 40 rows end at cum 30 → grp (29*4)/40 = 2; last key → grp 3
    assert(g10 === 2L && g99 === 3L, s"got $g10, $g99")
    // nGroups = 1: everything in group 0
    assert(Mixing.rangeLayout(two, "k", 1).select("grp").distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("assignSplits: total partition, exact cuts, stable under growth") {
    val docs = (1L to 2000L).toDF("doc_id")
    val split = Mixing.assignSplits(docs, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
    // every row gets exactly one split; coverage roughly matches fractions
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1600L && counts("val") < 300L && counts("test") < 300L)
    // a doc's split is a pure function of its id: growing the corpus
    // changes nothing (the stability property a random split lacks)
    val before = split.filter(col("doc_id") <= 500).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Mixing.assignSplits((1L to 500L).toDF("doc_id"), "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before === after)
    // misconfigured fractions refuse loudly
    intercept[IllegalArgumentException] {
      Mixing.assignSplits(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    // ...but quantization-level float error (< 1/65536) is accepted, per
    // the documented contract — token-count-derived ratios land here
    Mixing.assignSplits(docs, "doc_id",
      Seq("a" -> 2.0 / 3, "b" -> (1.0 / 3 + 1e-6))).collect()
  }

  test("cluster split never straddles a near-dup pair; an id split does") {
    // the leakage claim behind split_leakage_safe / the split_safe
    // stage: 60 exact-duplicate pairs (same text → Jaccard 1 → a
    // verified near-dup edge → same cluster; texts of different pairs
    // share 2 of 4 shingles, Jaccard 1/3 < 0.5, so no cross-pair
    // edges). An id-hash split puts SOME pair's two members on
    // different sides (P(no straddle) ≈ 0.815^60 ≈ 10⁻⁶, and md5 is
    // fixed, so this is deterministic for these ids); the cluster
    // split can't, by construction.
    val docs = (1L to 120L)
      .map(i => (i, s"duplicate text block number ${(i - 1) / 2} end"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-split-safe")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out =
      try {
        val frame = graft.pipeline.Pipeline.buildFrame(spark, s"""{
          "source": {"type": "table", "dir": "$tmp", "table": "documents"},
          "processors": [
            {"type": "split_safe", "idCol": "doc_id", "textCol": "text",
             "fractions": {"train": 0.90, "val": 0.05, "test": 0.05}}
          ],
          "sink": {"type": "noop"}
        }""")
        // the stage ADDS cluster/split — it must not project away the
        // input columns (a split artifact without the text is
        // untrainable; review catch)
        assert(frame.columns.toSet ==
          Set("doc_id", "text", "cluster", "split"),
          frame.columns.mkString(","))
        frame.select("doc_id", "cluster", "split").collect()
      } finally graft.queries.Registry.rmTree(tmp.toFile)
    val assigned = out
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(assigned.size === 120)
    // pair members share a cluster and therefore a split — zero straddles
    (1L to 120L by 2).foreach { a =>
      assert(assigned(a) === assigned(a + 1),
        s"pair ($a, ${a + 1}) straddles: ${assigned(a)} vs ${assigned(a + 1)}")
    }
    // the plain id-hash split DOES straddle at least one pair — the
    // leakage the cluster form exists to prevent
    val byId = Mixing.assignSplits(docs, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val straddles = (1L to 120L by 2).count(a => byId(a) != byId(a + 1))
    assert(straddles > 0,
      "id-hash split straddled no near-dup pair on this fixture — " +
        "the witness lost its teeth; enlarge the pair set")
  }

  test("globalShuffle: dense permutation, reproducible, not id order") {
    val docs = (1L to 500L).toDF("doc_id")
    val a = Mixing.globalShuffle(docs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // doc_id -> ord
    // ord is a DENSE 1-based permutation: the 500 ords are exactly 1..500
    assert(a.values.toSeq.sorted === (1L to 500L).toSeq)
    // deterministic: a second run produces the identical permutation
    val b = Mixing.globalShuffle(docs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
    // actually shuffled: the order correlates with md5, not with doc_id
    val inIdOrder = a.toSeq.sortBy(_._1).map(_._2)
    assert(inIdOrder !== (1L to 500L).toSeq, "permutation is the identity")
  }

  test("repetition: duplicate n-gram fractions match hand counts") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "a a a a"),            // toks 4/1 distinct; bigrams 3/1; trigrams 2/1
      (2L, "w x y z"),            // all distinct at every n
      (3L, "spam ham spam ham")   // toks 4/2; bigrams: sh hs sh -> 3/2; trigrams 2/2
    ).toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
    val got = TextAnalysis.repetition(df)
      .select("doc_id", "dup_tok_frac", "dup_2gram_frac", "dup_3gram_frac")
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1.0 - 1.0 / 4, 1.0 - 1.0 / 3, 1.0 - 1.0 / 2)))
    assert(got(2L) == ((0.0, 0.0, 0.0)))
    assert(got(3L) == ((1.0 - 2.0 / 4, 1.0 - 2.0 / 3, 0.0)))
  }

  test("decontaminate: exact n-gram collision flags the leaked doc only") {
    import graft.ops.Decontaminate
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // shares exactly one 5-gram with the benchmark doc
      (10L, "prefix alpha beta gamma delta epsilon suffix"),
      (11L, "totally different words with no overlap at all"),
      // shares all the WORDS but no contiguous 5-gram — vocabulary
      // overlap must not read as contamination
      (12L, "alpha beta gamma x delta epsilon zeta y")
    ).toDF("doc_id", "text")
    val got = Decontaminate.contaminated(corpus, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L))
    val scrubbed = Decontaminate.scrub(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(scrubbed == Set(11L, 12L))
    // a clean corpus passes through untouched
    assert(Decontaminate.contaminated(
      corpus.filter($"doc_id" > 10), bench, "doc_id", "text", n = 5).isEmpty)
  }

  test("zorderLayout: balanced buckets with 2-D locality") {
    val grid = spark.range(0, 1024).select(
      (col("id") % 32).as("a"), floor(col("id") / 32).cast("long").as("b"))
    val per = Mixing.zorderLayout(grid, "a", "b", bitsPerDim = 2)
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"), min("a").as("la"), max("a").as("ha"),
        min("b").as("lb"), max("b").as("hb"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(per.length == 16)
    // a uniform 32×32 grid splits into 16 exactly-balanced buckets...
    assert(per.forall(_._2 == 64), per.mkString(","))
    // ...each spanning 1/4 of EACH dimension — the 2-D locality a
    // single-column sort cannot give its trailing column
    assert(per.forall(r => r._4 - r._3 == 7 && r._6 - r._5 == 7),
      per.mkString(","))
  }

  test("sampleByTemperature: alpha interpolates natural to uniform, monotone") {
    def kept(alpha: Double): Map[String, Set[Long]] =
      Mixing.sampleByTemperature(docs, "lang", "doc_id", alpha)
        .select("lang", "doc_id").as[(String, Long)].collect()
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).toSet }
    val natural = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val cmin = natural.values.min
    // α = 1: the natural mixture, untouched
    assert(kept(1.0).map { case (l, s) => l -> s.size.toLong } == natural)
    // the smallest stratum is never downsampled at any α
    val smallest = natural.minBy(_._2)._1
    val k0 = kept(0.0)
    assert(k0(smallest).size.toLong == natural(smallest))
    // α = 0: every stratum lands near c_min (hash-slice quantization
    // scatter, ±20% at fixture counts)
    k0.foreach { case (l, s) =>
      assert(math.abs(s.size - cmin) <= cmin * 0.2 + 2,
        s"$l kept ${s.size}, want ≈ $cmin") }
    // raising α only ever ADDS docs, per stratum (re-mix is a delta)
    val (k3, k7) = (kept(0.3), kept(0.7))
    k3.foreach { case (l, s) => assert(s.subsetOf(k7(l)), s"non-monotone at $l") }
    assert(intercept[IllegalArgumentException](
      Mixing.sampleByTemperature(docs, "lang", "doc_id", 1.5))
      .getMessage.contains("alpha"))
  }

  test("sampleByTemperature: NULL strata form their own stratum, never dropped") {
    // consistent with sampleByRate (null keeps the default rate) and
    // with groupBy (null is a group): the null-safe join must not
    // silently drop unlabeled docs from the corpus
    val mixed = docs.withColumn("lang",
      when($"doc_id" % 3 === 0, lit(null: String)).otherwise($"lang"))
    val total = mixed.count()
    val nulls = mixed.filter($"lang".isNull).count()
    assert(nulls > 0, "fixture must exercise the null stratum")
    // α = 1 keeps EVERY row, labeled or not
    assert(Mixing.sampleByTemperature(mixed, "lang", "doc_id", 1.0)
      .count() == total)
    // at α = 0 the null stratum rebalances like any other: kept count
    // lands near c_min, and the kept docs are a subset of the null docs
    val counts = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    val cmin = counts.values.min
    val keptNull = Mixing.sampleByTemperature(mixed, "lang", "doc_id", 0.0)
      .filter($"lang".isNull).count()
    assert(math.abs(keptNull - cmin) <= cmin * 0.2 + 2,
      s"null stratum kept $keptNull, want ≈ $cmin")
  }

  test("rangeLayout refuses inputs with fewer rows than groups, loudly") {
    // zorderLayout drives nGroups to 2^bitsPerDim — a small input must
    // name the column and counts instead of NoSuchElementException
    val tiny = Seq(1L, 2L, 3L).toDF("k")
    val e = intercept[IllegalArgumentException](Mixing.rangeLayout(tiny, "k", 8))
    assert(e.getMessage.contains("k") && e.getMessage.contains("8"),
      e.getMessage)
    val ez = intercept[IllegalArgumentException](
      Mixing.zorderLayout(tiny.withColumn("j", $"k"), "k", "j", bitsPerDim = 3))
    assert(ez.getMessage.contains("bitsPerDim"), ez.getMessage)
  }
}
