package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.source.Changelog.table
import graft.ops.{Graphs, Mixing}

/** Link-analysis queries. The graph is derived from lineitem: within
  * each order, part at line k links to the part at line k+1 (the
  * clickstream/co-occurrence shape a crawl-curation pipeline ranks
  * over). PageRank runs in EXACT fixed-point integer arithmetic
  * ([[Graphs.pageRank]]), so the DuckDB oracle replays the identical
  * recurrence and the gate hash-compares every rank unit — an
  * approximate float PageRank could only gate on rows.
  *
  * The window order tie-breaks on l_partkey: (l_orderkey, l_linenumber)
  * is NOT unique in the fixture (11785 tie groups at sf0.01), and
  * lead() over a tied order is engine-dependent — with the partkey
  * tie-break the edge multiset is deterministic (equal-partkey ties
  * yield the same edges in either order), so Spark and DuckDB derive
  * the identical graph. */
object GraphQueries {

  private def edges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_partkey")
    table(s, dir, "lineitem")
      .select(col("l_partkey").as("src"),
        lead(col("l_partkey"), 1).over(w).as("dst"))
  }

  /** The oracle's replay of [[Graphs.pageRank]]'s exact recurrence,
    * unrolled to 3 rounds. `seedPred(expr)` is the seed predicate over
    * a node expression — `_ => "TRUE"` is global PageRank; restricting
    * it reproduces [[Graphs.personalizedPageRank]] (restart mass only
    * at seeds). `weighted` replays [[Graphs.pageRankWeighted]] with
    * per-(src,dst) multiplicity as the weight: contributions become
    * ⌊rank·w / Σw⌋ instead of ⌊rank/outdeg⌋. */
  private def prCte(seedPred: String => String,
      weighted: Boolean = false): String = {
    def rank(m: String, n: String) =
      s"CAST(CASE WHEN ${seedPred(n)} THEN 150000000 ELSE 0 END + " +
        s"(85 * coalesce($m, 0)) // 100 AS BIGINT)"
    val eCte = if (weighted)
      """e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        |  FROM raw WHERE dst IS NOT NULL GROUP BY src, dst),
        |od AS (SELECT src, sum(w) AS wsum FROM e GROUP BY src),""".stripMargin
    else
      """e AS (SELECT DISTINCT src, dst FROM raw WHERE dst IS NOT NULL),
        |od AS (SELECT src, count(*) AS outd FROM e GROUP BY src),""".stripMargin
    val contrib = if (weighted) "(r.rank * e.w) // od.wsum"
      else "r.rank // od.outd"
    def msgs(i: Int, prev: String) =
      s"""m$i AS (SELECT e.dst AS n, sum($contrib) AS m
         |  FROM e JOIN od ON od.src = e.src JOIN $prev r ON r.n = e.src
         |  GROUP BY e.dst)""".stripMargin
    s"""WITH raw AS (
       |  SELECT l_partkey AS src,
       |    lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
       |  FROM lineitem),
       |$eCte
       |nodes AS (SELECT DISTINCT n FROM
       |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e)),
       |r0 AS (SELECT n, CAST(CASE WHEN ${seedPred("n")}
       |    THEN 1000000000 ELSE 0 END AS BIGINT) AS rank FROM nodes),
       |${msgs(1, "r0")},
       |r1 AS (SELECT nodes.n, ${rank("m1.m", "nodes.n")} AS rank
       |  FROM nodes LEFT JOIN m1 ON m1.n = nodes.n),
       |${msgs(2, "r1")},
       |r2 AS (SELECT nodes.n, ${rank("m2.m", "nodes.n")} AS rank
       |  FROM nodes LEFT JOIN m2 ON m2.n = nodes.n),
       |${msgs(3, "r2")},
       |r3 AS (SELECT nodes.n, ${rank("m3.m", "nodes.n")} AS rank
       |  FROM nodes LEFT JOIN m3 ON m3.n = nodes.n)""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(

    // 3 damped rounds over the part→next-part graph. Each round is one
    // equi-join on src plus one map-side-combined long-sum to dst; the
    // edge set (with out-degrees) is computed once and reused. Ranks
    // are units of 1e-9.
    "graph_pagerank" -> QueryDef(
      (s, dir) => Graphs.pageRank(edges(s, dir), "src", "dst",
        iterations = 3).orderBy("node"),
      Some(s"""${prCte(_ => "TRUE")}
        |SELECT n AS node, rank AS rank_units FROM r3 ORDER BY node
        |""".stripMargin)),

    // Weighted PageRank: the raw (pre-distinct) edge stream carries
    // weight 1 per occurrence, so rank splits across out-edges by
    // co-occurrence MULTIPLICITY — the pairs-count signal the
    // unweighted form deliberately collapses. Same plan shape; the
    // per-edge multiply is the one extra overflow edge (bounded
    // loudly in the op).
    "graph_pagerank_weighted" -> QueryDef(
      (s, dir) => Graphs.pageRankWeighted(
        edges(s, dir).withColumn("w", lit(1L)), "src", "dst", "w",
        iterations = 3).orderBy("node"),
      Some(s"""${prCte(_ => "TRUE", weighted = true)}
        |SELECT n AS node, rank AS rank_units FROM r3 ORDER BY node
        |""".stripMargin)),

    // Seed-restart (personalized) PageRank: restart mass only at the
    // ~1/7 of parts in the "vetted seed list" — rank becomes
    // proximity-weighted reachability from the seeds, the crawl
    // seed-expansion score. Same plan shape; the seed flag rides the
    // cached node frame, no extra per-round join.
    "graph_pagerank_seeded" -> QueryDef(
      (s, dir) => {
        val seeds = table(s, dir, "lineitem")
          .select(col("l_partkey").as("seed"))
          .filter(col("seed") % 7 === 0)
        Graphs.personalizedPageRank(edges(s, dir), "src", "dst",
          seeds, "seed", iterations = 3).orderBy("node")
      },
      Some(s"""${prCte(n => s"$n % 7 = 0")}
        |SELECT n AS node, rank AS rank_units FROM r3 ORDER BY node
        |""".stripMargin)),

    // Rank-weighted seed selection: PageRank composed with
    // probability-proportional-to-size sampling — draw ~50 nodes with
    // inclusion probability ∝ authority score. Both legs are exact
    // integer arithmetic (fixed-point ranks, decimal(38)/HUGEINT keep
    // inequality), so the oracle value-checks every sampling DECISION,
    // not just the count.
    "graph_rank_weight" -> QueryDef(
      (s, dir) => {
        val ranks = Graphs.pageRank(edges(s, dir), "src", "dst",
          iterations = 3)
        Mixing.sampleByWeight(ranks, "node", "rank_units", n = 50)
          .orderBy("node")
      },
      Some(rankWeightOracle)),

    // The same chain assembled from JSON through the config front-end
    // (table → edges_lead → page_rank → mix_weight); must reproduce
    // graph_rank_weight byte-identically — same oracle. examples/
    // rank.json carries the standalone-runnable form for graft.Run.
    "pipeline_rank_cfg" -> QueryDef(
      (s, dir) => graft.pipeline.Pipeline.buildFrame(s, s"""{
          "source": {"type": "table", "dir": "$dir", "table": "lineitem"},
          "processors": [
            {"type": "edges_lead", "partitionCol": "l_orderkey",
             "orderCol": "l_linenumber", "valueCol": "l_partkey"},
            {"type": "page_rank", "srcCol": "src", "dstCol": "dst",
             "iterations": 3},
            {"type": "mix_weight", "idCol": "node",
             "weightCol": "rank_units", "n": 50}
          ],
          "sink": {"type": "noop"}
        }""").orderBy("node"),
      Some(rankWeightOracle)),

    // Per-node triangle count + local clustering coefficient (exact
    // 1e-9 fixed point) over the undirected simple part graph. The
    // Spark side runs the degree-oriented wedge enumeration (the
    // skew-proof plan: a hub's wedges migrate to its low-degree
    // neighbors, per-node wedge fanout O(√|E|)); the oracle replays
    // the orientation-free id-ordered enumeration — per-node counts
    // are orientation-independent, so values meet exactly.
    "graph_triangles" -> QueryDef(
      (s, dir) => Graphs.triangles(edges(s, dir), "src", "dst")
        .orderBy("node"),
      Some(s"""$undCte,
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS degree FROM
        |  (SELECT u AS n FROM und UNION ALL SELECT v FROM und) GROUP BY n),
        |tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
        |  FROM und a JOIN und b ON b.u = a.v
        |  JOIN und c ON c.u = a.u AND c.v = b.v),
        |pn AS (SELECT n, CAST(count(*) AS BIGINT) AS tri_count FROM
        |  (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
        |   UNION ALL SELECT z FROM tri) GROUP BY n)
        |SELECT deg.n AS node, degree,
        |  coalesce(tri_count, 0) AS tri_count,
        |  CAST(CASE WHEN degree >= 2 THEN
        |    (2 * CAST(coalesce(tri_count, 0) AS HUGEINT) * 1000000000)
        |      // (CAST(degree AS HUGEINT) * (degree - 1))
        |  ELSE 0 END AS BIGINT) AS lcc_units
        |FROM deg LEFT JOIN pn ON pn.n = deg.n
        |ORDER BY node""".stripMargin)),

    // Synchronous label-propagation communities, 3 rounds, min-label
    // tie-break — deterministic by construction, so the oracle replays
    // the identical rounds (count-argmax per node) and the gate
    // hash-compares every final label. Splits the part graph's giant
    // component into densely-linked families — the stratum a curation
    // pipeline balances across.
    "graph_lpa" -> QueryDef(
      (s, dir) => Graphs.labelPropagation(edges(s, dir), "src", "dst",
        iterations = 3).orderBy("node"),
      Some(s"""$undCte,
        |adj AS (SELECT u AS n, v AS nb FROM und
        |        UNION ALL SELECT v, u FROM und),
        |l0 AS (SELECT DISTINCT n, n AS label FROM adj),
        |${lpaRound(1, "l0")},
        |${lpaRound(2, "l1")},
        |${lpaRound(3, "l2")}
        |SELECT n AS node, CAST(label AS BIGINT) AS label FROM l3
        |ORDER BY node""".stripMargin)),

    // Multi-source BFS from the ~1/7 "vetted seed" parts, 3 hops over
    // the DIRECTED next-part graph — crawl-depth analysis (at what
    // hop does each part enter the seed expansion). The op runs
    // frontier-delta propagation (only newly-reached nodes join the
    // edge set; total join work across rounds = |reached| rows); the
    // oracle replays the equivalent full min-union unrolling.
    "graph_bfs" -> QueryDef(
      (s, dir) => {
        val seeds = table(s, dir, "lineitem")
          .select(col("l_partkey").as("seed"))
          .filter(col("seed") % 7 === 0)
        Graphs.bfsLevels(edges(s, dir), "src", "dst", seeds, "seed",
          maxDepth = 3).orderBy("node")
      },
      Some(s"""WITH raw AS (
        |  SELECT l_partkey AS src,
        |    lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |e AS (SELECT DISTINCT src, dst FROM raw WHERE dst IS NOT NULL),
        |nodes AS (SELECT DISTINCT n FROM
        |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e)),
        |d0 AS (SELECT n, CAST(0 AS BIGINT) AS dist FROM nodes WHERE n % 7 = 0),
        |${bfsRound(1, "d0")},
        |${bfsRound(2, "d1")},
        |${bfsRound(3, "d2")}
        |SELECT n AS node, dist FROM d3 ORDER BY node""".stripMargin)),

    // Harmonic centrality from a FIXED-K (16) md5-ranked landmark
    // sample, 3 hops over the directed part graph — the landmark/pivot
    // centrality estimate (reach complements pageRank's endorsement
    // mass). The landmark count is scale-INDEPENDENT by construction:
    // a fraction-of-nodes sample (the r17 `lm % 11` form) makes the
    // (landmark, node, dist) frame O(N²) at scale, which defeats the
    // whole point of landmark sampling; a deterministic md5 rank picks
    // the same 16 pivots on any engine (the mix_shuffle idiom) and the
    // frame stays O(16·N). Per-landmark BFS waves expand in the same
    // per-round jobs on the composite (landmark, node) key; the oracle
    // replays the md5 top-K, the unrolled min-union rounds, and the
    // exact fixed-point 1e9 div dist fold.
    "graph_closeness" -> QueryDef(
      (s, dir) => {
        val e = edges(s, dir)
        // landmark candidates = nodes of REAL edges only (both
        // endpoints, dst-only nodes included); md5-rank top-K is a
        // TakeOrdered — each partition keeps K, the driver merges K,
        // no global sort. Dropping the whole NULL-dst row — not just
        // null lm values — is what matches the oracle's node pool: a
        // NULL candidate would rank first (Spark sorts NULLS FIRST)
        // and a part appearing ONLY as the sole line of 1-line orders
        // has no edge at all, so the oracle never sees it and it must
        // not compete for a top-16 slot here (review catch: the
        // isNotNull-on-lm form still ranked such srcs).
        val realE = e.filter(col("src").isNotNull && col("dst").isNotNull)
        val lms = realE.select(col("src").as("lm"))
          .unionByName(realE.select(col("dst").as("lm"))).distinct()
          .orderBy(md5(col("lm").cast("string"))).limit(16)
        Graphs.harmonicCentrality(
          Graphs.landmarkDistances(e, "src", "dst", lms, "lm",
            maxDepth = 3)).orderBy("node")
      },
      Some(s"""WITH raw AS (
        |  SELECT l_partkey AS src,
        |    lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |e AS (SELECT DISTINCT src, dst FROM raw WHERE dst IS NOT NULL),
        |nodes AS (SELECT DISTINCT n FROM
        |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e)),
        |d0 AS (SELECT n AS lm, n, CAST(0 AS BIGINT) AS dist FROM
        |  (SELECT n FROM nodes ORDER BY md5(CAST(n AS VARCHAR)) LIMIT 16)),
        |${lmRound(1, "d0")},
        |${lmRound(2, "d1")},
        |${lmRound(3, "d2")}
        |SELECT n AS node, count(*) AS n_landmarks,
        |  CAST(sum(1000000000 // dist) AS BIGINT) AS harm_units
        |FROM d3 WHERE dist > 0
        |GROUP BY n ORDER BY node""".stripMargin)),

    // 2-core after 3 peel rounds over the undirected part graph — the
    // link-farm/tendril cleaning primitive. The op peels synchronously
    // (degree agg + two node-keyed semi-joins per round, edge frame
    // only shrinks); the oracle unrolls the identical rounds.
    "graph_kcore" -> QueryDef(
      (s, dir) => Graphs.kCorePeel(edges(s, dir), "src", "dst",
        k = 2, rounds = 3).orderBy("node"),
      Some(s"""$undCte,
        |e0 AS (SELECT u, v FROM und),
        |${kcoreRound(1, "e0", 2)},
        |${kcoreRound(2, "e1", 2)},
        |${kcoreRound(3, "e2", 2)}
        |SELECT n AS node, CAST(count(*) AS BIGINT) AS degree FROM
        |  (SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3)
        |GROUP BY n ORDER BY node""".stripMargin))
  )

  /** One landmark-BFS min-union round over (lm, n) states. */
  private def lmRound(i: Int, prev: String): String =
    s"""c$i AS (SELECT DISTINCT $prev.lm, e.dst AS n
       |  FROM e JOIN $prev ON $prev.n = e.src),
       |d$i AS (SELECT lm, n, min(dist) AS dist FROM
       |  (SELECT * FROM $prev UNION ALL
       |   SELECT lm, n, CAST($i AS BIGINT) FROM c$i) GROUP BY lm, n)""".stripMargin

  /** One synchronous peel round: nodes with current degree >= k
    * survive; edges keep only surviving endpoints. */
  private def kcoreRound(i: Int, prev: String, k: Int): String =
    s"""d$i AS (SELECT n FROM
       |  (SELECT u AS n FROM $prev UNION ALL SELECT v FROM $prev)
       |  GROUP BY n HAVING count(*) >= $k),
       |e$i AS (SELECT u, v FROM $prev
       |  WHERE u IN (SELECT n FROM d$i) AND v IN (SELECT n FROM d$i))""".stripMargin

  /** One BFS min-union round: everything reachable from the reached
    * set, folded by min distance. */
  private def bfsRound(i: Int, prev: String): String =
    s"""c$i AS (SELECT DISTINCT e.dst AS n FROM e JOIN $prev ON $prev.n = e.src),
       |d$i AS (SELECT n, min(dist) AS dist FROM
       |  (SELECT * FROM $prev UNION ALL
       |   SELECT n, CAST($i AS BIGINT) FROM c$i) GROUP BY n)""".stripMargin

  /** Canonical undirected simple graph off the lead-derived edge
    * stream: direction, duplicates, and self-loops collapse away. */
  private lazy val undCte =
    """WITH raw AS (
      |  SELECT l_partkey AS src,
      |    lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
      |  FROM lineitem),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |  FROM raw WHERE dst IS NOT NULL AND src <> dst)""".stripMargin

  /** One synchronous LPA round: neighbor-label counts, argmax with the
    * min-label tie-break. */
  private def lpaRound(i: Int, prev: String): String =
    s"""m$i AS (SELECT adj.n, l.label, count(*) AS c
       |  FROM adj JOIN $prev l ON l.n = adj.nb GROUP BY adj.n, l.label),
       |l$i AS (SELECT n, label FROM
       |  (SELECT n, label,
       |     row_number() OVER (PARTITION BY n ORDER BY c DESC, label) AS rn
       |   FROM m$i) WHERE rn = 1)""".stripMargin

  // lazy: `defs` above initializes first and captures this value — a
  // plain val would still be null at that point (declaration order)
  private lazy val rankWeightOracle =
    s"""${prCte(_ => "TRUE")},
      |rf AS (SELECT n AS node, rank AS rank_units FROM r3),
      |t AS (SELECT CAST(SUM(rank_units) AS HUGEINT) AS tw FROM rf),
      |uu AS (SELECT *,
      |${Registry.md5Slice("node")} AS u
      |  FROM rf)
      |SELECT node, rank_units FROM uu, t
      |WHERE CAST(u AS HUGEINT) * tw
      |    < CAST(50 AS HUGEINT) * CAST(rank_units AS HUGEINT)
      |      * CAST(65536 AS HUGEINT)
      |ORDER BY node
      |""".stripMargin
}
