package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.Mixing

/** Property checks for corpus composition: packing invariants against a
  * driver-side model over random corpora, and sampling monotonicity
  * over random rate pairs. */
class MixingPropSpec extends SparkSpec {
  import spark.implicits._

  private val corpusGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 80)
    ids <- Gen.pick(n, 0L until 200L)
    toks <- Gen.listOfN(n, Gen.choose(1L, 300L))
  } yield ids.toList.zip(toks)

  test("packByOffset invariants hold for random corpora, ctx sizes, shard counts") {
    val prop = Prop.forAll(corpusGen, Gen.choose(16, 512), Gen.choose(1, 8)) {
      (docs, ctx, nShards) =>
        val df = docs.toDF("doc_id", "toks")
        val got = Mixing.packByOffset(df, "doc_id", "toks", ctx, nShards)
          .select("doc_id", "toks", "shard", "start_off", "pack_id")
          .as[(Long, Long, Int, Long, Long)].collect()
        // one row per doc, nothing invented
        val exact = got.length == docs.length &&
          got.map(_._1).toSet == docs.map(_._1).toSet
        // model: within each shard, docs in id order, gapless running
        // offsets, pack = boundary the offset lands in
        val model = got.groupBy(_._3).forall { case (shard, rows) =>
          val ordered = rows.sortBy(_._1)
          var off = 0L
          ordered.forall { case (_, toks, sh, start, pack) =>
            val ok = start == off &&
              pack == (sh.toLong << 42) + start / ctx
            off += toks
            ok
          }
        }
        exact && model
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("pack_id spaces stay disjoint across shards past the old Int.MaxValue stride") {
    // Token counts sized so every shard's pack index blows far past
    // 2^31 (where the old `shard * Int.MaxValue` stride bled into the
    // next shard's space): ~40 docs of 6.4e10 tokens per shard ≈
    // 2.56e12 tokens ≈ pack_no 5e9 at ctx=512. Ids interleave shards
    // via identity hash mod 2.
    val docs = (0L until 80L).map(i => (i, 64_000_000_000L)).toDF("doc_id", "toks")
    val got = Mixing.packByOffset(docs, "doc_id", "toks", ctxTokens = 512,
      nShards = 2, shardHash = c => c) // identity hash: shard = id % 2
      .select("shard", "pack_id").as[(Int, Long)].collect()
    val byShard = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byShard.keySet == Set(0, 1))
    // every shard-0 id below every shard-1 id — disjoint intervals
    assert(byShard(0).max < byShard(1).min)
    // and each shard's ids sit inside its own 2^42 window
    assert(byShard(0).forall(p => p >= 0L && p < (1L << 42)))
    assert(byShard(1).forall(p => p >= (1L << 42) && p < (2L << 42)))
    // past the per-shard space the op raises instead of wrapping:
    // one doc placed at a start_off beyond 2^42 packs
    val monster = Seq((0L, (1L << 42) * 512 + 512), (2L, 1L))
      .toDF("doc_id", "toks")
    val e = intercept[Exception] {
      Mixing.packByOffset(monster, "doc_id", "toks", ctxTokens = 512,
        nShards = 2, shardHash = c => c).collect()
    }
    assert(causeMessages(e).exists(_.contains("pack index overflow")), s"got: $e")
  }

  test("token-budget sampling meets the budget and is monotone in it") {
    val rnd = new scala.util.Random(20260813L)
    val docs = (0L until 400L).map(i =>
      (i, if (i % 3 == 0) "en" else "de", 1L + rnd.nextInt(50)))
      .toDF("doc_id", "lang", "toks")
    val totals = docs.groupBy("lang").agg(sum("toks").as("t"))
      .as[(String, Long)].collect().toMap
    def kept(budget: Long): Map[String, (Set[Long], Long)] =
      Mixing.sampleByTokenBudget(docs, "lang", "doc_id", "toks",
        Map("en" -> budget, "de" -> budget))
        .select("lang", "doc_id", "toks").as[(String, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(rs => (rs.map(_._2).toSet, rs.map(_._3).sum)).toMap
    val budgetGen = Gen.choose(0L, 12000L)
    val prop = Prop.forAll(budgetGen, budgetGen) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val (kLo, kHi) = (kept(lo), kept(hi))
      Seq("en", "de").forall { lang =>
        val (idsLo, _) = kLo.getOrElse(lang, (Set.empty[Long], 0L))
        val (idsHi, tokHi) = kHi.getOrElse(lang, (Set.empty[Long], 0L))
        // monotone: a bigger budget keeps a superset
        idsLo.subsetOf(idsHi) &&
          // satisfied: kept tokens reach min(budget, stratum total)
          tokHi >= math.min(hi, totals(lang)) &&
          // a zero budget keeps NOTHING (excluding a stratum must not
          // leak its first hash slice)
          (lo > 0 || idsLo.isEmpty)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("zorderLayout invariants hold for random skewed distributions") {
    // keys drawn from a skewed pool — buckets stay whole-key contiguous
    // per dimension and the z decode recovers exactly the (ga, gb) cell
    val rowsGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(20, 200)
      as <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.choose(0L, 9L), 1 -> Gen.choose(10L, 99L)))
      bs <- Gen.listOfN(n, Gen.choose(0L, 49L))
    } yield as.zip(bs)
    val prop = Prop.forAll(rowsGen, Gen.choose(1, 3)) { (rows, bits) =>
      val df = rows.toDF("a", "b")
      val got = Mixing.zorderLayout(df, "a", "b", bitsPerDim = bits)
        .select("a", "b", "zbucket").as[(Long, Long, Long)].collect()
      val n = 1 << bits
      // decode: even bits → a-group, odd bits → b-group
      def de(z: Long, off: Int) =
        (0 until bits).map(i => ((z >> (2 * i + off)) & 1L) << i).sum
      // every row's z decodes within range
      val inRange = got.forall { case (_, _, z) =>
        de(z, 0) < n && de(z, 1) < n && z < (1L << (2 * bits)) }
      // per-dimension groups are contiguous whole-key ranges: the max key
      // of group g is below the min key of group g+1
      def contiguous(grp: Array[(Long, Long)]): Boolean = {
        val byG = grp.groupBy(_._2).view.mapValues(v => (v.map(_._1).min, v.map(_._1).max))
        byG.keys.toSeq.sorted.sliding(2).forall {
          case Seq(g1, g2) => byG(g1)._2 < byG(g2)._1
          case _ => true
        }
      }
      inRange &&
        contiguous(got.map(r => (r._1, de(r._3, 0)))) &&
        contiguous(got.map(r => (r._2, de(r._3, 1))))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("capPerKey equals the naive single-window top-n for random corpora") {
    // the salted two-phase form must be a pure optimization: same rows,
    // same ranks, for any n/salts — including salts=1 (degenerate) and
    // heavy ties in the order column
    val rowsGen = for {
      n <- Gen.choose(1, 120)
      ids <- Gen.pick(n, 0L until 300L)
      keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "hot"))
      ord <- Gen.listOfN(n, Gen.choose(0L, 5L)) // small range → many ties
    } yield ids.toList.lazyZip(keys).lazyZip(ord).toList
    val hotGen = Gen.someOf(Seq("a", "b", "c", "hot")).map(_.toSeq)
    val prop = Prop.forAll(rowsGen, Gen.choose(1, 6), Gen.choose(1, 8), hotGen) {
      (rows, n, salts, hot) =>
        val df = rows.toDF("doc_id", "key", "ord")
        val got = Mixing.capPerKey(df, "key", "ord", "doc_id", n, salts,
          hotKeys = hot)
          .select("key", "doc_id", "rk").as[(String, Long, Long)]
          .collect().sortBy(r => (r._1, r._3))
        val model = rows.groupBy(_._2).toSeq.flatMap { case (k, grp) =>
          grp.sortBy(r => (-r._3, r._1)).take(n).zipWithIndex
            .map { case ((id, _, _), i) => (k, id, i + 1L) }
        }.sortBy(r => (r._1, r._3))
        got.toSeq == model
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("sampleByWeight matches the exact integer model and is monotone in n") {
    val docs = (0L until 400L).map(i => (i, 1L + (i * 7919) % 500))
    val df = docs.toDF("doc_id", "w")
    val tw = docs.map(_._2).map(BigInt(_)).sum
    def u(id: Long): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      BigInt(Integer.parseInt(md.take(2).map("%02x".format(_)).mkString, 16))
    }
    val prop = Prop.forAll(Gen.oneOf(0L, 1L, 17L, 100L, 400L, 100000L)) { n =>
      val got = Mixing.sampleByWeight(df, "doc_id", "w", n)
        .select("doc_id").as[Long].collect().toSet
      val model = docs.filter { case (id, w) =>
        u(id) * tw < BigInt(n) * BigInt(w) * 65536
      }.map(_._1).toSet
      got == model
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
    // monotone: kept(n) ⊆ kept(n')
    def kept(n: Long) = Mixing.sampleByWeight(df, "doc_id", "w", n)
      .select("doc_id").as[Long].collect().toSet
    assert(kept(50L).subsetOf(kept(200L)))
    // n past saturation keeps everything; zero keeps nothing
    assert(kept(1000000L).size == 400 && kept(0L).isEmpty)
  }

  test("repeatByEpochs matches the exact md5 model and is monotone in milli-epochs") {
    def md5u(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:ep".getBytes("UTF-8"))
          .take(2).map(b => f"${b & 0xff}%02x").mkString, 16)
    def modelCopies(id: Long, m: Long): Long =
      m / 1000 + (if (md5u(id) * 1000 < (m % 1000) * 65536) 1L else 0L)
    val ids = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val milliGen = Gen.choose(0L, 4000L)
    val prop = Prop.forAll(milliGen, milliGen) { (a, b) =>
      def sched(m: Long): Map[(Long, Long), Long] =
        Mixing.repeatByEpochs(ids, "lang", "doc_id",
          Map("en" -> m), defaultMilli = 1000L)
          .select("doc_id", "epoch").as[(Long, Long)].collect()
          .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      val got = sched(a)
      // exact model: epochs 1..copies per doc, each exactly once
      val want = (0L until 200L).flatMap { i =>
        val m = if (i % 2 == 0) a else 1000L
        (1L to modelCopies(i, m)).map(e => (i, e) -> 1L)
      }.toMap
      val exact = got == want
      // monotone: the (doc, epoch) set at min(a,b) is a subset of max's
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val mono = sched(lo).keySet.subsetOf(sched(hi).keySet)
      if (!exact) println(s"MISMATCH milli=$a\n got=$got\n want=$want")
      exact && mono
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("sampleExactN: exact size, prefix nesting, partitioning-invariant") {
    val ids = (0L until 257L).map(i => (i, s"d$i")).toDF("doc_id", "body")
    val nGen = Gen.choose(0, 300)
    val prop = Prop.forAll(nGen, nGen) { (a, b) =>
      def draw(n: Int, parts: Int): Seq[Long] =
        Mixing.sampleExactN(ids.repartition(parts), "doc_id", n)
          .select("doc_id").as[Long].collect().toSeq.sorted
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val dLo = draw(lo, 3); val dHi = draw(hi, 3)
      // exact size (clamped at corpus), strict prefix nesting, and the
      // same draw regardless of input partitioning
      dLo.size == math.min(lo, 257) && dHi.size == math.min(hi, 257) &&
        dLo.toSet.subsetOf(dHi.toSet) && dHi == draw(hi, 7)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("sampleByRate is monotone in the rate for random rate pairs") {
    val ids = (0L until 300L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val rateGen = Gen.choose(0, 100).map(_ / 100.0)
    val prop = Prop.forAll(rateGen, rateGen) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      def kept(r: Double): Set[Long] =
        Mixing.sampleByRate(ids, "lang", "doc_id", Map("en" -> r), default = 0.0)
          .select("doc_id").as[Long].collect().toSet
      kept(lo).subsetOf(kept(hi))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
