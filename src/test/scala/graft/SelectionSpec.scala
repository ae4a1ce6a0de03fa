package graft

import org.apache.spark.sql.functions._
import graft.ops.{Selection, Similarity}

/** DSIR-style importance selection ([[Selection]]) and SemDeDup
  * ([[Similarity.semDedup]]): the two selection/dedup ops whose gated
  * forms are `dsir_select` and `dedup_semantic`. These specs pin the
  * SEMANTICS on constructed fixtures — evidence-not-length scoring,
  * sign structure, earliest-id-wins dedup — which the oracle hash
  * compare cannot articulate. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // target vocabulary A vs raw-only vocabulary B; doc 1..3 are target
  // exemplars, 4..7 candidates of controlled composition. Docs are
  // LONG (patterns repeated 60×) so gram totals dwarf the add-one
  // smoothing mass (= buckets) — the regime where the centered
  // weight's sign is meaningful (Selection.scala's contract is about
  // corpora, not 5-token fixtures).
  private def rep(s: String, n: Int = 60) = Seq.fill(n)(s).mkString(" ")
  private def corpus = Seq(
    (1L, rep("alpha beta gamma alpha beta"), "tgt"),
    (2L, rep("beta gamma alpha gamma beta"), "tgt"),
    (3L, rep("gamma alpha beta beta gamma"), "tgt"),
    (4L, rep("alpha beta gamma beta alpha"), "raw"), // target-like
    (5L, rep("zeta eta theta iota kappa"), "raw"),   // disjoint vocab
    (6L, rep("alpha beta gamma beta alpha zeta eta theta iota kappa"), "raw"),
    (7L, rep("zeta eta theta iota kappa", 120), "raw")
  ).toDF("doc_id", "text", "kind")

  test("gramBuckets: unigrams + bigrams, bounded bucket ids") {
    val g = corpus.select(col("doc_id"),
      Selection.gramBuckets(col("text"), 64).as("g"))
    val sizes = g.select(col("doc_id"), size(col("g")).as("n"))
      .as[(Long, Int)].collect().toMap
    // n tokens -> 2n-1 grams (docs 1/5: 300 tokens; doc 6: 600)
    assert(sizes(1L) == 599 && sizes(5L) == 599 && sizes(6L) == 1199)
    val all = g.select(explode(col("g"))).as[Int].collect()
    assert(all.forall(b => b >= 0 && b < 64))
    // single-token doc: one unigram, no bigram (the zip_with tail pair
    // concat-nulls out)
    val one = Seq((9L, "solo")).toDF("doc_id", "text")
      .select(size(Selection.gramBuckets(col("text"), 64))).as[Int].head()
    assert(one == 1)
  }

  test("dsirScores: evidence not length — target-vocab docs positive, disjoint negative") {
    val s = Selection.dsirScores(corpus, col("kind") === "tgt",
      "doc_id", "text", buckets = 256)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // pure target vocab scores positive, pure disjoint vocab negative
    assert(s(4L) > 0, s"target-like doc should score > 0, got ${s(4L)}")
    assert(s(5L) < 0, s"disjoint-vocab doc should score < 0, got ${s(5L)}")
    // doc 7 is LONGER than doc 5 but just as target-foreign: more
    // negative evidence, lower score — a raw ratio sum would reward
    // the length instead
    assert(s(7L) < s(5L),
      s"longer foreign doc must score lower (7=${s(7L)} vs 5=${s(5L)})")
    // mixed doc sits between its pure halves
    assert(s(6L) < s(4L) && s(6L) > s(5L))
  }

  test("dsirSelect: top-k by (score desc, id asc), ranks 1..k, deterministic") {
    val sel = Selection.dsirSelect(corpus, col("kind") === "tgt",
      "doc_id", "text", k = 3, buckets = 256)
      .select("doc_id", "score", "rank")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(sel.map(_._3).toSeq == Seq(1L, 2L, 3L))
    assert(sel.map(_._2).toSeq == sel.map(_._2).sortBy(-_).toSeq)
    // the disjoint-vocab docs must not make a k=3 cut over 7 docs
    assert(!sel.map(_._1).contains(5L) && !sel.map(_._1).contains(7L))
    val again = Selection.dsirSelect(corpus, col("kind") === "tgt",
      "doc_id", "text", k = 3, buckets = 256)
      .select("doc_id", "score", "rank")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(sel.toSeq == again.toSeq)
  }

  test("dsirLogScores agrees with the fixed-point form on sign and clear ranks") {
    val fx = Selection.dsirScores(corpus, col("kind") === "tgt",
      "doc_id", "text", buckets = 256)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val lg = Selection.dsirLogScores(corpus, col("kind") === "tgt",
      "doc_id", "text", buckets = 256)
      .select(col("doc_id"), col("log_score"))
      .as[(Long, Double)].collect().toMap
    assert(lg(4L) > 0 && lg(5L) < 0)
    assert((lg(4L) > lg(5L)) == (fx(4L) > fx(5L)))
    assert((lg(7L) < lg(5L)) == (fx(7L) < fx(5L)))
  }

  test("guards: buckets bounds, positive k and scale") {
    intercept[IllegalArgumentException] {
      Selection.dsirScores(corpus, lit(true), "doc_id", "text", buckets = 0)
    }
    intercept[IllegalArgumentException] {
      Selection.dsirScores(corpus, lit(true), "doc_id", "text", buckets = 65537)
    }
    intercept[IllegalArgumentException] {
      Selection.dsirSelect(corpus, lit(true), "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Selection.dsirScores(corpus, lit(true), "doc_id", "text", scale = 0L)
    }
  }

  // ── SemDeDup ──────────────────────────────────────────────────────

  private def vecsDf(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "v")

  test("semDedup: earliest cluster-mate wins; chain points at the earliest, not the neighbor") {
    val a = Seq(1.0, 0.0, 0.0)
    val b = Seq(0.0, 1.0, 0.0)
    // 10/11/12 identical to each other and to nothing else; 20 alone
    val out = Similarity.semDedup(
      vecsDf((10L, a), (11L, a), (12L, a), (20L, b)),
      tau = 0.99, cells = 1)
      .select("vec_id", "dup_of", "keep")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == ((-1L, 1L)))
    assert(out(11L) == ((10L, 0L)))
    assert(out(12L) == ((10L, 0L)), "dup_of must be the EARLIEST mate, not the nearest")
    assert(out(20L) == ((-1L, 1L)))
  }

  test("semDedup: tau gates the drop; orthogonal vectors all survive") {
    val vs = vecsDf((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(1.0, 0.0)))
    val strict = Similarity.semDedup(vs, tau = 0.5, cells = 1)
      .select("vec_id", "keep").as[(Long, Long)].collect().toMap
    assert(strict == Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
    val loose = Similarity.semDedup(vs, tau = -1.0, cells = 1)
      .filter(col("keep") === 1).select("vec_id").as[Long].collect().toSet
    assert(loose == Set(1L), "tau = -1 keeps only the earliest per cell")
  }

  test("semDedup: every input appears exactly once with a cell label") {
    val vs = vecsDf((1L, Seq(1.0, 0.2)), (2L, Seq(0.2, 1.0)),
      (3L, Seq(-1.0, 0.4)), (4L, Seq(0.3, -0.9)))
    val out = Similarity.semDedup(vs, tau = 0.95, cells = 2,
      portableSeeding = true)
    assert(out.count() == 4)
    assert(out.select("vec_id").distinct().count() == 4)
    assert(out.filter(col("cell") < 0 || col("cell") >= 2).count() == 0)
  }

  test("dsirResample: deterministic Gumbel draw; tiny temperature degenerates to score order") {
    val r1 = Selection.dsirResample(corpus, col("kind") === "tgt",
      "doc_id", "text", k = 4, buckets = 256)
      .select("doc_id").as[Long].collect().toSeq
    val r2 = Selection.dsirResample(corpus, col("kind") === "tgt",
      "doc_id", "text", k = 4, buckets = 256)
      .select("doc_id").as[Long].collect().toSeq
    assert(r1 == r2, "the md5-derived draw must be rerun-stable")
    assert(r1.size == 4)
    // T -> 0: score/T dominates the O(1) Gumbel noise -> pure score order
    val cold = Selection.dsirResample(corpus, col("kind") === "tgt",
      "doc_id", "text", k = 4, temperature = 1e-9, buckets = 256)
      .select("doc_id").as[Long].collect().toSeq
    val byScore = Selection.dsirLogScores(corpus, col("kind") === "tgt",
      "doc_id", "text", buckets = 256)
      .orderBy(col("log_score").desc, col("doc_id"))
      .select("doc_id").as[Long].collect().take(4).toSeq
    assert(cold == byScore)
    intercept[IllegalArgumentException] {
      Selection.dsirResample(corpus, lit(true), "doc_id", "text",
        k = 4, temperature = 0.0)
    }
  }

  test("semDedup keepFarthest: the farthest-from-centroid member wins the ball") {
    // cells=1, portable seeding: the centroid is id 2's vector (lowest
    // (id*2654435761) % 2^32). cos-to-centroid: id3 0.747 < id1 0.98 <
    // id2 1.0 -> farthest rank order 3, 1, 2. All pairwise cosines
    // >= 0.5 (min is v1.v3 = 0.6): one ball.
    val vs = vecsDf(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.98, 0.199)),
      (3L, Seq(0.6, 0.8)))
    val far = Similarity.semDedup(vs, tau = 0.5, cells = 1,
      portableSeeding = true, keepFarthest = true)
      .select("vec_id", "dup_of", "keep")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(far(3L) == ((-1L, 1L)), s"farthest member must be the keeper: $far")
    assert(far(1L) == ((3L, 0L)) && far(2L) == ((3L, 0L)))
    // earliest mode keeps id 1 on the same fixture
    val early = Similarity.semDedup(vs, tau = 0.5, cells = 1,
      portableSeeding = true)
      .select("vec_id", "keep").as[(Long, Long)].collect().toMap
    assert(early == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("fitWeights/scoreAgainst: dense table, fit-then-apply equals dsirScores, frozen under new data") {
    val w = Selection.fitWeights(corpus, col("kind") === "tgt", "text",
      buckets = 256)
    assert(w.count() == 256)
    assert(w.select("bucket").distinct().count() == 256)
    // identity: scoring the training corpus against its own fitted
    // table reproduces dsirScores exactly
    val applied = Selection.scoreAgainst(corpus, w, "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val direct = Selection.dsirScores(corpus, col("kind") === "tgt",
      "doc_id", "text", buckets = 256)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(applied == direct)
    // frozen: scoring NEW docs against the stored table does not move
    // old scores (the incremental-admission contract) — and a pure
    // target-vocab newcomer scores positive without any refit
    val newDocs = Seq((100L, rep("alpha beta gamma alpha beta")),
      (101L, rep("zeta eta theta iota kappa"))).toDF("doc_id", "text")
    val scoredNew = Selection.scoreAgainst(newDocs, w, "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(scoredNew(100L) > 0 && scoredNew(101L) < 0)
    val appliedAgain = Selection.scoreAgainst(corpus, w, "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(appliedAgain == applied)
    // non-dense tables fail loudly
    intercept[IllegalArgumentException] {
      Selection.scoreAgainst(newDocs, w.filter(col("bucket") =!= 7),
        "doc_id", "text").collect()
    }
  }

  test("semDedup's assignment cache is registered and freed by GraphBlocks.release") {
    // the ADVICE r18 leak pattern, closed for the new op: the assigned
    // frame's DF cache lives in the CacheManager (never freed on frame
    // drop); the returned frame must carry a GraphBlocks registration
    // so repeated invocations in one session do not accumulate blocks
    // clean slate: earlier tests' frames may be GC'd already (registry
    // keys are weak), leaving CacheManager entries only clearCache can
    // sweep — the Verify/probe harnesses run exactly this pair between
    // queries
    graft.ops.GraphBlocks.releaseAll()
    spark.catalog.clearCache()
    val cm = spark.sharedState.cacheManager
    val vs = vecsDf((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(1.0, 0.1)))
    val out = Similarity.semDedup(vs, tau = 0.9, cells = 1)
    out.count() // materialize: caller done with the frame
    assert(graft.ops.GraphBlocks.registered >= 1)
    assert(!cm.isEmpty, "expected the assignment cache to be live")
    graft.ops.GraphBlocks.release(out)
    assert(cm.isEmpty, "assignment cache survived release")
    assert(out != null) // hold the frame: registry keys are weak
  }

  test("GraphBlocks.scoped releases frames dropped inside the scope (the pipeline-run lifecycle)") {
    // the r19 ADVICE residue: a stage lambda that drops its registered
    // frame (semantic_dedup keeps only the keeper ids) leaves the
    // assignment cache reclaimable ONLY via global clearCache once the
    // frame is GC'd — the weak registry entry clears key AND value.
    // A scope pins registrations strongly and releases on exit, so the
    // cache frees deterministically with no caller-held reference.
    graft.ops.GraphBlocks.releaseAll()
    spark.catalog.clearCache()
    val cm = spark.sharedState.cacheManager
    graft.ops.GraphBlocks.scoped {
      val out = Similarity.semDedup(
        vecsDf((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (3L, Seq(1.0, 0.1))),
        tau = 0.9, cells = 1)
      out.count() // materialize, then DROP the frame inside the scope
      assert(!cm.isEmpty, "expected the assignment cache to be live")
    }
    assert(cm.isEmpty, "scoped exit must unpersist the barrier cache")
    assert(graft.ops.GraphBlocks.registered == 0)
  }

  test("frozenScorer rejects an oversized weights table without a full collect") {
    // a wrong weightsPath (e.g. a corpus parquet) must fail the dense-
    // table require — and the collect behind it is pre-bounded to
    // 65537 rows, so the failure costs bounded driver memory
    val big = spark.range(0, 70000L)
      .select(col("id").cast("int").as("bucket"), lit(1L).as("w"))
    val e = intercept[IllegalArgumentException] {
      Selection.frozenScorer(big, "doc_id", "text")
    }
    assert(e.getMessage.contains("65536"))
  }

  test("ANN-assisted assignment: superCells=1 equals brute exactly; separated clusters agree at G>1") {
    // 24 vectors in 4 well-separated direction clusters (near the 4
    // axes of R^4, small deterministic jitter)
    val rows = (0L until 24L).map { i =>
      val axis = (i % 4).toInt
      val v = Array.fill(4)(0.02 * ((i % 5).toInt + 1))
      v(axis) = 1.0
      (i, v.toSeq)
    }
    val vs = vecsDf(rows: _*)
    def verdicts(superCells: Int) =
      Similarity.semDedup(vs, tau = 0.95, cells = 4,
        portableSeeding = true, superCells = superCells)
        .select("vec_id", "cell", "dup_of", "keep")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    val brute = verdicts(0)
    // one super-group routes every vector to ALL centroids — the hier
    // path must be EXACTLY brute, not approximately (a seeded quantizer
    // whose cells are NOT separated is exactly the case G=1 must not
    // change: this fixture's hash-ranked seeds put two cells on one
    // axis and none on another)
    assert(verdicts(1) == brute)
    val bruteKeep = brute.count(_._4 == 1L)
    assert(bruteKeep > 0 && bruteKeep < 24)
    // G>1 against an explicitly SEPARATED quantizer (the paper regime —
    // trained cells, one per direction cluster): the nearest centroid's
    // super-group is the vector's nearest super-centroid, so the IVF
    // probe trade costs nothing and hier == brute cell for cell
    import spark.implicits._
    val axes = (0L until 4L).map { c =>
      (c, Seq.tabulate(4)(j => if (j == c.toInt) 1.0 else 0.0))
    }.toDF("cell", "cv")
    val vs2 = vecsDf(rows: _*)
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bruteCells = cellsOf(Similarity.assignCells(
      vs2, axes, "_id", "_v", probes = 1, "vec_id", "v"))
    val hierCells = cellsOf(Similarity.assignCellsHier(
      vs2, axes, superCells = 2, "_id", "_v", "vec_id", "v",
      portableSeeding = true))
    assert(hierCells == bruteCells)
    // and every vector landed on its own axis (the separated contract)
    assert(bruteCells.forall { case (id, c) => c == id % 4 })
  }

  test("assignCellsHier properties on random fixtures: subset-scoring bound + G=1 identity") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the hier route scores a SUBSET of centroids exactly, so per
    // vector its chosen cell's cosine can never EXCEED brute's best —
    // and at G=1 (one super-group = all centroids scored) it must
    // equal brute cell-for-cell. Checked over random vector sets,
    // cell counts, and group counts.
    val vecGen: Gen[List[(Long, Seq[Double])]] = for {
      n <- Gen.choose(6, 30)
      dim <- Gen.choose(2, 6)
      rows <- Gen.listOfN(n,
        Gen.listOfN(dim, Gen.choose(-5, 5).map(_.toDouble + 0.25)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    val prop = Prop.forAll(vecGen, Gen.choose(2, 6), Gen.choose(1, 3)) {
      (rows, cells, g) =>
        val vs = vecsDf(rows: _*)
        val cent = Similarity.seedCentroids(vs, cells,
          Similarity.seedHashFor("vec_id", portableSeeding = true),
          "vec_id", "v")
        def best(df: org.apache.spark.sql.DataFrame) =
          df.join(cent, Seq("cell"))
            .select(col("_id"), col("cell"),
              Similarity.cosine(col("_v"), col("cv")).as("d"))
            .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
            .toMap
        val brute = best(Similarity.assignCells(
          vs, cent, "_id", "_v", probes = 1, "vec_id", "v"))
        val hier = best(Similarity.assignCellsHier(
          vs, cent, g, "_id", "_v", "vec_id", "v", portableSeeding = true))
        val covered = hier.keySet == brute.keySet
        val bound = hier.forall { case (id, (_, d)) =>
          d <= brute(id)._2 + 1e-12
        }
        val identityAtG1 = g != 1 ||
          hier.view.mapValues(_._1).toMap == brute.view.mapValues(_._1).toMap
        covered && bound && identityAtG1
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("semDedup guards") {
    val vs = vecsDf((1L, Seq(1.0)))
    intercept[IllegalArgumentException] {
      Similarity.semDedup(vs, tau = 1.5, cells = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.semDedup(vs, tau = 0.5, cells = 0)
    }
  }
}
