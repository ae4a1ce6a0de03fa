package graft

import org.apache.spark.sql.functions._
import graft.ops.Graphs

/** [[graft.ops.Graphs.pageRank]] — exact integer link analysis. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // default scale (1.0 in rank units)
  private val B = 150000000L  // base = S * 15 / 100

  test("pageRank: one round on a hand-computed triangle + sink") {
    // 1→2, 1→3, 2→3; 3 is a sink (dangling mass absorbs — leaks by design)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d")
    val r = Graphs.pageRank(e, "s", "d", iterations = 1)
      .as[(Long, Long)].collect().toMap
    // rank⁰ = S everywhere; contributions: 1 sends S/2 to each of 2,3;
    // 2 sends S to 3; 3 sends nothing.
    assert(r(1L) == B)
    assert(r(2L) == B + 85L * (S / 2) / 100)
    assert(r(3L) == B + 85L * (S / 2 + S) / 100)
  }

  test("pageRank: duplicate and null edges collapse/drop; ranks deterministic under repartition") {
    val e = Seq(
      Some(1L) -> Some(2L), Some(1L) -> Some(2L), // duplicate: no double influence
      Some(2L) -> Some(1L), Some(1L) -> None,     // null dst dropped
      None -> Some(2L)
    ).toDF("s", "d").select(col("s"), col("d"))
    val a = Graphs.pageRank(e, "s", "d", iterations = 2)
      .as[(Long, Long)].collect().toMap
    val b = Graphs.pageRank(e.repartition(7), "s", "d", iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    // pure 2-cycle conserves mass exactly at every round: rank stays S
    assert(a == Map(1L -> S, 2L -> S))
  }

  test("pageRank: hub accumulates; more iterations move rank toward the cycle's stationary split") {
    // star into a 2-cycle: 10,11,12 → 1; 1 ⇄ 2
    val star = (10L to 12L).map(_ -> 1L)
    val e = (star ++ Seq(1L -> 2L, 2L -> 1L)).toDF("s", "d")
    val r = Graphs.pageRank(e, "s", "d", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(r.size == 5)
    // leaves keep only base mass after round 1
    assert(r(10L) == B && r(11L) == B && r(12L) == B)
    // hand-replay of the exact integer recurrence: mass oscillates
    // between the cycle's two nodes (even rounds favor 2), leaves feed
    // a constant 3·(dampNum·B/dampDen) into 1 from round 2 on
    def round(r1: Long, r2: Long, leaf: Long): (Long, Long) =
      (B + 85L * (3L * leaf + r2) / 100, B + 85L * r1 / 100)
    var (c1, c2, leaf) = (S, S, S)
    (1 to 4).foreach { _ =>
      val n = round(c1, c2, leaf); c1 = n._1; c2 = n._2; leaf = B
    }
    assert(r(1L) == c1 && r(2L) == c2)
    assert(r(2L) > r(1L) && r(1L) > r(10L))
  }

  test("pageRankWeighted: rank splits by weight; duplicates sum; w=1 equals pageRank") {
    // 1→2 (w 2 via duplicate rows), 1→3 (w 1): 1's mass splits 2:1
    val e = Seq((1L, 2L, 1L), (1L, 2L, 1L), (1L, 3L, 1L)).toDF("s", "d", "w")
    val r = Graphs.pageRankWeighted(e, "s", "d", "w", iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) == B)
    assert(r(2L) == B + 85L * (S * 2 / 3) / 100)
    assert(r(3L) == B + 85L * (S / 3) / 100)
    // uniform weights reproduce the unweighted op exactly
    val e2 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val g = Graphs.pageRank(e2, "s", "d", iterations = 3)
      .as[(Long, Long)].collect().toMap
    val w1 = Graphs.pageRankWeighted(e2.withColumn("w", lit(1L)),
      "s", "d", "w", iterations = 3).as[(Long, Long)].collect().toMap
    assert(g == w1)
  }

  test("pageRankWeighted: refuses oversized weights loudly; drops non-positive") {
    val e = Seq((1L, 2L, Long.MaxValue / 2), (2L, 1L, 1L)).toDF("s", "d", "w")
    val ex = intercept[IllegalArgumentException] {
      Graphs.pageRankWeighted(e, "s", "d", "w", iterations = 1)
    }
    assert(ex.getMessage.contains("overflow"))
    // zero/negative weights drop — 1→3 (w 0) and 3→1 (w −2) vanish, so
    // both survivors point at 2, which receives BOTH full masses
    val e2 = Seq((1L, 2L, 5L), (1L, 3L, 0L), (3L, 1L, -2L), (3L, 2L, 4L))
      .toDF("s", "d", "w")
    val r = Graphs.pageRankWeighted(e2, "s", "d", "w", iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(2L) == B + 85L * (S + S) / 100) // full mass of 1 AND of 3
  }

  test("personalizedPageRank: restart mass only at seeds; off-graph seeds ignored") {
    // triangle 1→2, 1→3, 2→3; seeds {1, 99} — 99 has no edges
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d")
    val seeds = Seq(1L, 99L).toDF("seed")
    val r = Graphs.personalizedPageRank(e, "s", "d", seeds, "seed",
      iterations = 1).as[(Long, Long)].collect().toMap
    // rank⁰ = S only at 1; non-seeds get NO base term
    assert(r.size == 3 && !r.contains(99L))
    assert(r(1L) == B)
    assert(r(2L) == 85L * (S / 2) / 100)
    assert(r(3L) == 85L * (S / 2) / 100)
  }

  test("personalizedPageRank: all-nodes seed set reproduces global pageRank") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    val seeds = (1L to 3L).toDF("seed")
    val g = Graphs.pageRank(e, "s", "d", iterations = 3)
      .as[(Long, Long)].collect().toMap
    val p = Graphs.personalizedPageRank(e, "s", "d", seeds, "seed",
      iterations = 3).as[(Long, Long)].collect().toMap
    assert(g == p)
  }

  test("pageRank: refuses overflow-range scale loudly") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    val ex = intercept[IllegalArgumentException] {
      Graphs.pageRank(e, "s", "d", iterations = 1, scale = Long.MaxValue / 10)
    }
    assert(ex.getMessage.contains("overflow"))
  }

  test("GraphBlocks.release frees an iterative op's pinned checkpoint blocks") {
    // the ADVICE r16 leak: iterative ops pin MEMORY_AND_DISK
    // localCheckpoint blocks behind their returned frame, which survive
    // catalog.clearCache(); release(df) must free exactly them, and
    // releaseAll() must empty the registry
    graft.ops.GraphBlocks.releaseAll()
    val sc = spark.sparkContext
    def pinnedIds = sc.getPersistentRDDs.keySet
    val before = pinnedIds
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val pr = Graphs.pageRank(e, "s", "d", iterations = 2)
    pr.count() // materialize: caller done with the frame
    assert(graft.ops.GraphBlocks.registered >= 1)
    assert((pinnedIds -- before).nonEmpty, "expected pinned round blocks")
    graft.ops.GraphBlocks.release(pr)
    assert((pinnedIds -- before).isEmpty,
      s"blocks survived release: ${pinnedIds -- before}")
    // releaseAll sweeps every still-registered frame's blocks (the
    // frame is HELD here: registry keys are weak, so a dropped frame
    // reverts to the ContextCleaner path instead)
    val bfs = Graphs.bfsLevels(e, "s", "d", Seq(1L).toDF("seed"), "seed", 3)
    bfs.count()
    assert((pinnedIds -- before).nonEmpty)
    graft.ops.GraphBlocks.releaseAll()
    assert((pinnedIds -- before).isEmpty && graft.ops.GraphBlocks.registered == 0)
    // keep the frames reachable past releaseAll so weak keys can't
    // clear mid-test
    assert(bfs != null && pr != null)
  }
}
