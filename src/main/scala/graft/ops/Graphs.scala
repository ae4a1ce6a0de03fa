package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative link-analysis over an edge list — the authority-scoring
  * step a crawl-scale curation pipeline runs BEFORE sampling: rank
  * domains/pages by the link graph, then weight admission or mixing by
  * the score (CommonCrawl-style harmonic/PageRank centrality feeding
  * seed selection; compose with [[Mixing.sampleByWeight]] for
  * rank-proportional draws). Complements [[Clusters.components]]
  * (reachability) with a quantitative importance measure on the same
  * edge-list representation.
  *
  * EXACT integer arithmetic, by design: ranks live in fixed-point
  * units of 1/`scale` (default 1e-9), every per-edge contribution is
  * an integral division, and the damping multiply-divide is integral
  * too. Long addition is associative — the per-node message sum is
  * bit-identical under ANY partitioning or AQE re-plan, so scores are
  * reproducible run-to-run and engine-to-engine (the DuckDB oracle
  * replays the identical recurrence), unlike a double-typed PageRank
  * whose sums drift with partition order. The quantization error is
  * bounded (< outdeg ulps per node per round, each ulp = 1/scale) and
  * identical everywhere.
  *
  * Recurrence (the classic simplified form; dangling mass leaks, not
  * redistributed — a node with no out-edges absorbs):
  *   rank⁰(n)   = scale                         (i.e. 1.0)
  *   rankⁱ⁺¹(n) = base + (dampNum · Σ_{(m,n)∈E} ⌊rankⁱ(m)/outdeg(m)⌋) div dampDen
  * with base = (scale · (dampDen − dampNum)) div dampDen  (0.15 · scale).
  *
  * Scale shape: the loop body is one equi-join (ranks × edges on src —
  * |V| rows joined to |E|, shuffled on the node key) and one long-sum
  * hash aggregation to dst (map-side combined: a hot page's in-edges
  * partial-sum before the exchange, so a 10⁸-in-link node receives one
  * long per upstream partition, not 10⁸ rows). The edge set with its
  * out-degrees attached is computed ONCE and cached across rounds;
  * lineage is cut every round with the same explicit RDD
  * localCheckpoint + previous-round unpersist discipline as
  * [[Clusters.components]] (round k must not replay rounds 1..k−1, and
  * the loop holds exactly one round of rank blocks at any moment). On
  * a cluster the checkpoint goes to the cluster FS; iterations are a
  * fixed budget — rank deltas shrink geometrically (damping), so a
  * deployment picks iterations ≈ log(tolerance)/log(damp), not a
  * convergence probe per round.
  */
object Graphs {

  /** (node, rank_units) for every node appearing as src or dst in
    * `edges`. Duplicate edges are collapsed (link multiplicity does not
    * multiply influence — the standard web-graph convention); self-loops
    * kept if present in the distinct set (callers usually filter them
    * when deriving edges). Fails loudly if |V| · scale · dampNum could
    * overflow a long (the message-sum bound). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame =
    run(edges, srcCol, dstCol, None, null, iterations, scale, dampNum, dampDen)

  /** Personalized (seed-restart) PageRank: the restart mass — both the
    * initial rank AND the per-round base term — goes ONLY to the seed
    * nodes, so rank measures proximity-weighted reachability FROM the
    * seed set rather than global authority. This is the crawl
    * seed-EXPANSION form: start from a vetted domain list, rank the
    * whole graph by seeded score, admit/weight the frontier by it
    * (compose with [[Mixing.sampleByWeight]]). Same exact integer
    * recurrence with base(n) = base · 1_seed(n) and rank⁰(n) =
    * scale · 1_seed(n); seeds not present in the graph are ignored
    * (they have no edges to carry mass anyway). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iterations: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame =
    run(edges, srcCol, dstCol, Some(seeds), seedCol, iterations, scale,
      dampNum, dampDen)

  /** Weighted PageRank: a source's rank splits across its out-edges
    * PROPORTIONAL to edge weight — ⌊rank·w / Σw⌋ per edge — instead of
    * evenly. Duplicate (src, dst) rows SUM their weights (so a raw
    * pre-aggregated edge list with weight 1 per occurrence ranks by
    * co-occurrence multiplicity — the form the unweighted op
    * deliberately collapses); non-positive/null weights drop. Same
    * exact-integer contract: with w ≡ 1 this IS pageRank (the
    * unweighted loop runs this expression with w=1, wsum=outdeg).
    * Extra overflow edge: the per-edge multiply rank·w — bounded
    * loudly by |V|·scale·max(w) (rank ≤ total mass ≤ |V|·scale). */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame =
    run(edges, srcCol, dstCol, None, null, iterations, scale,
      dampNum, dampDen, weight = Some(weightCol))

  private def run(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Option[DataFrame], seedCol: String,
      iterations: Int, scale: Long,
      dampNum: Long, dampDen: Long,
      weight: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"pageRank needs iterations >= 1 (got $iterations)")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < dampNum < dampDen (got $dampNum/$dampDen)")
    require(scale > 0, s"scale must be positive (got $scale)")
    // the base term multiplies scale by (dampDen - dampNum) < dampDen
    // BEFORE dividing — bound it here, not just the message sum below
    require(scale <= Long.MaxValue / dampDen,
      s"pageRank overflow bound: scale $scale x dampDen $dampDen exceeds " +
        "long range — lower scale")
    val spark = edges.sparkSession
    // cached: nodes0 reads e twice (src and dst legs) and eod twice
    // (edge side + out-degree agg) — uncached, the upstream edge
    // derivation would run ~4x during prep (the probe's measured
    // bottleneck); released below once eod/nodes are materialized
    val e = (weight match {
      case None => edges
        .select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct().withColumn("w", lit(1L))
      case Some(wc) =>
        // weights collapse and total in DECIMAL first: the per-(src,dst)
        // and per-src sums are where magnitudes accumulate, and a long
        // sum would either throw a bare ANSI ArithmeticException or
        // (ANSI off) wrap silently past any later check. Validated
        // loudly here, then cast down — every per-pair weight is ≤ its
        // src's total, so the long downcast cannot overflow.
        val ed = edges
          .select(col(srcCol).cast("long").as("src"),
            col(dstCol).cast("long").as("dst"),
            col(wc).cast("decimal(38,0)").as("wd"))
          .filter(col("src").isNotNull && col("dst").isNotNull &&
            col("wd").isNotNull && col("wd") > 0)
          .groupBy("src", "dst").agg(sum("wd").as("wd"))
        val mx = ed.groupBy("src").agg(sum("wd").as("wsd"))
          .agg(max("wsd")).head()
        if (!mx.isNullAt(0))
          require(mx.getDecimal(0).compareTo(
            new java.math.BigDecimal(Long.MaxValue)) <= 0,
            "pageRank overflow bound: a source's total edge weight " +
              s"exceeds long range (max per-src total ${mx.getDecimal(0)})")
        ed.select(col("src"), col("dst"), col("wd").cast("long").as("w"))
    }).cache()
    // nodes carry their seed flag (everyone is a "seed" in the global
    // form) — the flag rides the cached frame so the per-round base
    // term needs no extra join
    val nodes0 = e.select(col("src").as("n"))
      .unionByName(e.select(col("dst").as("n"))).distinct()
    val nodes = seeds match {
      case None => nodes0.withColumn("is_seed", lit(true)).cache()
      case Some(sd) =>
        val sl = sd.select(col(seedCol).cast("long").as("n"))
          .filter(col("n").isNotNull).distinct()
          .withColumn("_s", lit(true))
        nodes0.join(sl, Seq("n"), "left")
          .select(col("n"), coalesce(col("_s"), lit(false)).as("is_seed"))
          .cache()
    }
    // edge set with per-src weight total attached — the loop-invariant
    // operand, built and cached once (re-deriving inside the loop would
    // re-shuffle |E| every round); the decimal validation above already
    // proved every per-src long sum fits
    val eod = e.join(e.groupBy("src").agg(sum("w").as("wsum")), "src").cache()
    val (nNodes, wMax) = graft.PhaseClock.time("pr.edges") {
      eod.count()
      val wm = if (weight.isEmpty) 1L else {
        val r = e.agg(max("w")).head()
        if (r.isNullAt(0)) 1L else r.getLong(0) // null: no surviving edge
      }
      val n = nodes.count()
      e.unpersist(blocking = false) // eod/nodes now hold the operands
      (n, wm)
    }
    // total mass never exceeds |V|·scale (contributions are floors of a
    // conserved quantity), so the damping multiply is the overflow edge
    require(nNodes <= Long.MaxValue / dampNum / scale,
      s"pageRank overflow bound: $nNodes nodes x scale $scale x damp " +
        s"$dampNum exceeds long range — lower scale")
    // weighted per-edge multiply: rank·w with rank ≤ |V|·scale
    // (nNodes·scale cannot itself overflow — the require above bounds
    // it through dampNum ≥ 1)
    require(wMax <= Long.MaxValue / (math.max(nNodes, 1L) * scale),
      s"pageRank overflow bound: max edge weight $wMax x $nNodes nodes " +
        s"x scale $scale exceeds long range — lower scale or weights")
    val base = scale * (dampDen - dampNum) / dampDen
    val seedBase = when(col("is_seed"), lit(base)).otherwise(lit(0L))
    var ranks = nodes.select(col("n"),
      when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("rank"))
    var liveRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    (1 to iterations).foreach { _ =>
      val next = roundFrame(eod, ranks, nodes, seedBase, dampNum, dampDen)
      graft.PhaseClock.count("pr.rounds")
      val rdd = graft.PhaseClock.time("pr.round") {
        val r = next.rdd
        r.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.localCheckpoint()
        r.count() // materialize before dropping the previous round
        r
      }
      ranks = spark.createDataFrame(rdd, next.schema)
      if (liveRdd != null) liveRdd.unpersist(blocking = false)
      liveRdd = rdd
    }
    nodes.unpersist()
    eod.unpersist()
    // the final round's checkpoint stays persisted for the caller, as
    // in Clusters.components
    ranks.select(col("n").as("node"), col("rank").as("rank_units"))
  }

  /** One rank round as a frame — the loop body, exposed so the plan
    * shape (map-side-combined message HashAggregate, equi-keyed joins
    * only) can be pinned by tests without re-deriving the dataflow. */
  private[graft] def roundFrame(eod: DataFrame, ranks: DataFrame,
      nodes: DataFrame, seedBase: Column,
      dampNum: Long, dampDen: Long): DataFrame = {
    val msgs = eod
      .join(ranks.select(col("n").as("src"), col("rank")), "src")
      .select(col("dst").as("n"), expr("(rank * w) div wsum").as("c"))
      .groupBy("n").agg(sum("c").as("m"))
    nodes.join(msgs, Seq("n"), "left")
      .select(col("n"),
        (seedBase + expr(s"($dampNum * coalesce(m, 0L)) div $dampDen")).as("rank"))
  }
}
