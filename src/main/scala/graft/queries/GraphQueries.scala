package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.source.Changelog.table
import graft.ops.Graphs

/** Link-analysis queries. The graph is derived from lineitem: within
  * each order, part at line k links to the part at line k+1 (the
  * clickstream/co-occurrence shape a crawl-curation pipeline ranks
  * over). PageRank runs in EXACT fixed-point integer arithmetic
  * ([[Graphs.pageRank]]), so the DuckDB oracle replays the identical
  * recurrence and the gate hash-compares every rank unit — an
  * approximate float PageRank could only gate on rows. */
object GraphQueries {

  val defs: Map[String, QueryDef] = Map(

    // 3 damped rounds over the part→next-part graph. Each round is one
    // equi-join on src plus one map-side-combined long-sum to dst; the
    // edge set (with out-degrees) is computed once and reused. Ranks
    // are units of 1e-9. The window order tie-breaks on l_partkey:
    // (l_orderkey, l_linenumber) is NOT unique in the fixture (11785
    // tie groups at sf0.01), and lead() over a tied order is
    // engine-dependent — with the partkey tie-break the edge multiset
    // is deterministic (equal-partkey ties yield the same edges in
    // either order), so Spark and DuckDB derive the identical graph.
    "graph_pagerank" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("l_orderkey")
          .orderBy("l_linenumber", "l_partkey")
        val edges = table(s, dir, "lineitem")
          .select(col("l_partkey").as("src"),
            lead(col("l_partkey"), 1).over(w).as("dst"))
        Graphs.pageRank(edges, "src", "dst", iterations = 3)
          .orderBy("node")
      },
      Some("""WITH raw AS (
        |  SELECT l_partkey AS src,
        |    lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |e AS (SELECT DISTINCT src, dst FROM raw WHERE dst IS NOT NULL),
        |od AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT n FROM
        |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e)),
        |r0 AS (SELECT n, CAST(1000000000 AS BIGINT) AS rank FROM nodes),
        |m1 AS (SELECT e.dst AS n, sum(r.rank // od.outd) AS m
        |  FROM e JOIN od ON od.src = e.src JOIN r0 r ON r.n = e.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT nodes.n,
        |    CAST(150000000 + (85 * coalesce(m1.m, 0)) // 100 AS BIGINT) AS rank
        |  FROM nodes LEFT JOIN m1 ON m1.n = nodes.n),
        |m2 AS (SELECT e.dst AS n, sum(r.rank // od.outd) AS m
        |  FROM e JOIN od ON od.src = e.src JOIN r1 r ON r.n = e.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT nodes.n,
        |    CAST(150000000 + (85 * coalesce(m2.m, 0)) // 100 AS BIGINT) AS rank
        |  FROM nodes LEFT JOIN m2 ON m2.n = nodes.n),
        |m3 AS (SELECT e.dst AS n, sum(r.rank // od.outd) AS m
        |  FROM e JOIN od ON od.src = e.src JOIN r2 r ON r.n = e.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT nodes.n,
        |    CAST(150000000 + (85 * coalesce(m3.m, 0)) // 100 AS BIGINT) AS rank
        |  FROM nodes LEFT JOIN m3 ON m3.n = nodes.n)
        |SELECT n AS node, rank AS rank_units FROM r3 ORDER BY node
        |""".stripMargin))
  )
}
