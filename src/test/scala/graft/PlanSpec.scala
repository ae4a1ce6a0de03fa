package graft

import org.apache.spark.sql.DataFrame
import graft.queries.Registry

/** Plan-shape regression guards: these assert the physical properties
  * that make the headline queries scale (PLANS.md documents why). A
  * failure here means a change re-introduced a plan that works at
  * sf0.01 but dies at 100 TB. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.all(name).fn(spark, sf).queryExecution.executedPlan.toString

  test("q1_agg: filter pushed to scan, partial hash aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortAggregate"))
  }

  test("q3_join and q5_multijoin broadcast every dimension side") {
    val p3 = plan("q3_join")
    assert(p3.contains("BroadcastHashJoin"))
    assert(p3.contains("EqualTo(c_mktsegment,BUILDING)")) // dim filter pushed
    val p5 = plan("q5_multijoin")
    assert(p5.contains("EqualTo(r_name,ASIA)"))
    // lineitem is never exchanged before the aggregation in q5
    assert(!p5.contains("SortMergeJoin"))
  }

  test("p8_compact stays in pure hash aggregation (no sort-based fallback)") {
    val p = plan("p8_compact")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortAggregate"),
      "string-typed agg buffers would force SortAggregate — keep ops int-coded")
  }

  test("asof_join costs exactly one keyed exchange for the window") {
    val p = plan("asof_join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges:\n$p")
  }

  test("no query uses a single-partition global window") {
    // a Window with an empty partition spec shows as 'Window [..], [col ASC...'
    // preceded by Exchange SinglePartition — the pattern that dies at scale
    Registry.all.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS") ||
        !p.contains("Window "),
        s"$name moves all rows to one partition for a window")
    }
  }

  test("ann_lsh candidates meet on the bucket shuffle key, never n²") {
    val p = plan("ann_lsh")
    assert(!p.contains("CartesianProduct"),
      "LSH candidate generation degenerated to a cross product")
    // the candidate join is an equi-join on (tbl_id, bucket) — hash or
    // broadcast, either is bucket-keyed; the brute-force path's
    // BroadcastNestedLoopJoin must NOT appear here
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "LSH path must not fall back to the brute-force nested-loop join")
  }

  test("incremental admission paths meet on their bucket keys, never n²") {
    Seq("dedup_incremental", "dedup_embed_incr", "pipeline_admit").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: increment admission must stay a bucket-keyed equi-join")
    }
  }

  test("image near-dup pairs meet on the hamming band key, never n²") {
    val p = plan("mm_phash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "phash candidate generation must stay a (band, key) equi-join")
  }

  test("boilerplate + lm scoring stay gram-keyed equi-joins, never n²") {
    // corpus-statistics joins must meet on the gram/bigram shuffle key;
    // a nested-loop fallback here is O(model × corpus) at 100 TB
    Seq("text_boilerplate", "text_lm_score").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: corpus-statistics joins must stay key-partitioned equi-joins")
    }
  }

  test("DeltaStore.read stays one scan + one hash agg however deep the chains") {
    import spark.implicits._
    val target = java.nio.file.Files
      .createTempDirectory("graft-plan-delta").toString + "/state"
    (0 until 6).foreach { i =>
      graft.sink.DeltaStore.append(
        Seq(("t", i.toLong, "insert", i.toLong, i, i / 2.0))
          .toDF("tbl", "pk", "net_op", "r_id", "r_k", "r_v"),
        target, Seq("tbl", "pk"), nBuckets = 4, batchId = i)
    }
    assert(graft.sink.DeltaStore.readManifest(target).values.flatten.toSet.size > 1)
    val p = graft.sink.DeltaStore.read(spark, target).get
      .queryExecution.executedPlan.toString
    // the resolve must be ONE multi-path scan (not a union of one scan
    // per live generation — that plan grows with maxLiveGens) feeding
    // ONE map-side-partial hash aggregation (max_by, no window sort)
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 scan over all generations, got $scans:\n$p")
    assert(!p.contains("Union"), "read plan grew a per-generation union")
    assert(p.contains("HashAggregate") && !p.contains("SortAggregate"))
    assert(!p.contains("Window "), "LWW resolve must not use a window sort")
  }

  test("scans prune columns: q1 reads 6 of 11 lineitem columns") {
    val p = plan("q1_agg")
    val cols = "FileScan parquet \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
      .map(_.group(1)).getOrElse(fail(s"no FileScan in plan:\n$p"))
    assert(cols.split(",").length == 6, s"ReadSchema not pruned: $cols")
  }

  test("decontamination broadcasts the benchmark side — the corpus never shuffles") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark n-gram set must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "a shuffled n-gram join drags the whole exploded corpus through the wire")
  }

  test("PQ serving: no all-pairs path, top-k pruned map-side") {
    // the ADC scoring join is broadcast (per-query LUTs) and the IVF+PQ
    // candidate join is a cell equi-join — nothing may degenerate to a
    // non-broadcast cross product; WindowGroupLimit proves the top-k
    // rank filter prunes BEFORE the per-query exchange (the property
    // that keeps the final shuffle per-query-bounded at any corpus size)
    for (q <- Seq("ann_pq", "ann_ivf_pq")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q degenerated to a cross product")
      assert(p.contains("WindowGroupLimit"),
        s"$q lost the map-side top-k pushdown")
    }
  }

  test("keepBest prunes its argmax map-side, never sort-aggregates") {
    val p = plan("dedup_keep_best")
    // rank-1 window with WindowGroupLimit: at most one candidate per
    // (cluster, partition) reaches the exchange
    assert(p.contains("WindowGroupLimit"),
      "keepBest lost the map-side rank-1 pushdown")
    assert(!p.contains("SortAggregate"),
      "a struct-typed agg buffer fell back to SortAggregate")
  }

  test("dedup_spans: keeper min is a pure hash agg on the packed long") {
    val p = plan("dedup_spans")
    assert(!p.contains("CartesianProduct"),
      "span dedup must meet on the chunk-hash equi-join")
    // the first-occurrence agg runs BEFORE the rebuild's collect_list
    // aggs: it must be codegen'd HashAggregate (a struct-min buffer
    // would sort the whole exploded chunk stream)
    assert(!p.contains("SortAggregate"),
      "keeper min fell back to SortAggregate — keep the (id,pos) packing")
    assert(p.contains("HashAggregate"))
  }

  test("release_zorder: assignment is map-only — one exchange for the final agg") {
    val p = plan("release_zorder")
    // boundary folds happen at plan-build time (bounded collects);
    // the executed plan is scan → project(z) → partial agg → exchange →
    // final agg: exactly ONE keyed exchange, nothing else moves rows
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges:\n$p")
    assert(!p.contains("SortAggregate"))
  }

  test("pageRank round: message sum is a partial (map-side) hash agg, joins equi-keyed") {
    import org.apache.spark.sql.functions._
    // the loop-body plan a hot in-link node meets: the dst sum must
    // carry a partial_sum phase (the hot node then receives one
    // partial per upstream partition, not its row share), stay out of
    // sort-agg fallback, and never go cartesian
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    val e = graft.source.Changelog.table(spark, sf, "lineitem")
      .select(col("l_partkey").cast("long").as("src"),
        lead(col("l_partkey"), 1).over(w).cast("long").as("dst"))
      .filter(col("dst").isNotNull).distinct().withColumn("w", lit(1L))
    val eod = e.join(e.groupBy("src").agg(sum("w").as("wsum")), "src")
    val nodes = e.select(col("src").as("n"))
      .unionByName(e.select(col("dst").as("n"))).distinct()
      .withColumn("is_seed", lit(true))
    val ranks = nodes.select(col("n"), lit(1000000000L).as("rank"))
    val p = graft.ops.Graphs.roundFrame(eod, ranks, nodes,
        when(col("is_seed"), lit(150000000L)).otherwise(lit(0L)), 85L, 100L)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"), s"message sum lost map-side combine:\n$p")
    assert(!p.contains("SortAggregate"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("triangle wedges meet on equi-keys with map-side corner counts, never n² blind") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the pinned shape is what a hub survives: the wedge self-join must
    // key on the shared source (the orientation-order filter rides as a
    // residual, NOT as the join condition — that would go nested-loop),
    // the closing join on the composite (t, t2), and the per-node
    // corner count must partial-aggregate before its exchange
    val oriented = Seq((1L, 2L, 3L), (1L, 3L, 3L), (2L, 3L, 3L))
      .toDF("s", "t", "dt")
    val deg = Seq((1L, 2L), (2L, 2L), (3L, 2L)).toDF("n", "degree")
    val p = graft.ops.Graphs.triangleFrame(oriented, deg)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"wedge enumeration degenerated to an unkeyed product:\n$p")
    assert(p.contains("partial_count"),
      s"per-node corner count lost map-side combine:\n$p")
    assert(!p.contains("SortAggregate"))
  }

  test("LPA round: two hash aggs (count + argmax), no per-node window sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val adj = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("n", "nb")
    val labels = adj.select(col("n")).distinct()
      .select(col("n"), col("n").as("label"))
    val p = graft.ops.Graphs.lpaRoundFrame(adj, labels)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count"),
      s"neighbor-label count lost map-side combine:\n$p")
    assert(!p.contains("Window"),
      s"argmax fell back to a per-node window sort:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("sampleExactN plans as top-n, never a global sort") {
    // orderBy+limit must fuse to TakeOrderedAndProject: each partition
    // keeps its local n and the driver merges heads — a range-exchange
    // Sort would shuffle the whole corpus to draw 100 rows
    val p = graft.ops.Mixing.sampleExactN(
        graft.source.Changelog.table(spark, sf, "documents"), "doc_id", 100)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"exact-N draw lost the top-n plan:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"exact-N draw global-sorts the corpus:\n$p")
  }

  test("funnel: step mins partial-aggregate map-side, joins stay equi-keyed") {
    val p = plan("events_funnel")
    assert(p.contains("partial_min"),
      s"step-position min lost map-side combine:\n$p")
    assert(!p.contains("SortAggregate"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"funnel step join degenerated to an unkeyed product:\n$p")
  }

  test("funnel-by-key: NO window in the plan — a hot entity never sorts in one task") {
    val p = plan("events_funnel_keys")
    assert(!p.contains("Window"),
      s"key-form funnel regrew a window — the hot-entity one-task sort:\n$p")
    assert(p.contains("partial_min"))
    assert(!p.contains("SortAggregate"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("conversion-window funnel keeps the key form's plan shape") {
    // the min_by(ts, key) anchor must not cost the form its structure:
    // still Window-free (hot entity never one-task sorts), still
    // map-side-combined hash aggs, still equi-keyed step joins
    val p = plan("events_funnel_window")
    assert(!p.contains("Window"),
      s"windowed funnel regrew a window operator:\n$p")
    assert(p.contains("partial_min"))
    assert(!p.contains("SortAggregate"),
      s"min_by anchor pushed the step agg to SortAggregate:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("retention: min-agg map-side-combined, no window, equi-keyed join") {
    val p = plan("events_retention")
    assert(p.contains("partial_min"),
      s"cohort min lost map-side combine:\n$p")
    assert(!p.contains("Window"))
    assert(!p.contains("SortAggregate"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("BFS round: frontier meets edges on the src equi-key, anti-join keyed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val frontier = Seq(Tuple1(1L)).toDF("n")
    val dist = Seq((1L, 0L)).toDF("n", "dist")
    val p = graft.ops.Graphs.bfsRoundFrame(frontier, e, dist, 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"BFS round degenerated to an unkeyed product:\n$p")
    // the frontier distinct must partial-aggregate before its exchange
    // (a hub frontier node fans to one partial per upstream partition)
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortAggregate"))
  }

  test("stream_join meets on the user-id equi-key with range residuals") {
    val p = plan("stream_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "interval join degenerated to an unkeyed product — the time bounds " +
        "must ride as residual conditions on the user_id equi-join")
  }

  test("admission candidate scan prunes to (doc_id, bands) — never the arrays") {
    // the point of persisting the packed band column: candidate
    // generation must read fixed-width band structs WITHOUT dragging the
    // shingle-set and signature arrays through the scan — at corpus
    // scale those arrays are ~all of the store's bytes
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cfg = graft.ops.Admission.Config(
      target = java.nio.file.Files.createTempDirectory("graft-plan-adm")
        .resolve("store").toString,
      checkpoint = "unused")
    graft.ops.Admission.admitBatch(
      Seq((1L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"), cfg, 0L)
    val store = graft.ops.Admission.readStore(spark, cfg.target).get
    val candSide = store.select(col("doc_id"), explode(col("bands")).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val p = candSide.queryExecution.executedPlan.toString
    val cols = "FileScan parquet \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
      .map(_.group(1)).getOrElse(fail(s"no FileScan in plan:\n$p"))
    assert(!cols.contains("sh") && !cols.contains("sig"),
      s"candidate scan reads the heavy array columns: $cols")
    assert(cols.contains("doc_id") && cols.contains("bands"), cols)
  }

  test("dsir scoring: one narrow doc-keyed exchange, hash agg, no join") {
    // the scale contract of Selection.dsirScores (PLANS r19): after the
    // bounded histogram pass, scoring is explode + the codegen'd bucket
    // hash + ONE map-side-combined integer agg against the literal
    // weight array — the corpus must never join, never sort-aggregate,
    // and never shuffle more than one (id, long, long) row per doc
    import org.apache.spark.sql.functions.col
    val docs = graft.source.Changelog.table(spark, sf, "documents")
    val p = graft.ops.Selection.dsirScores(docs,
      col("lang") === "en", "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges:\n$p")
    assert(p.contains("HashAggregate") && !p.contains("SortAggregate"), p)
    assert(!p.contains("Join"), "the scoring pass must not join")
  }

  test("dedup_semantic: cached assignment reused, dominator agg stays hash") {
    // two r19 plan fixes pinned: (1) the assigned frame is cached and
    // CONSUMED through InMemoryTableScan by both pair-join sides and
    // the verdict join — uncached, the centroid-assignment pass (a
    // full corpus scan + scoring) ran 3x; (2) the dominated-victim agg
    // keys min_by on the SINGLE _rk column — a struct key is not
    // hash-aggregable and silently sort-aggregated the FULL pair frame
    // (the keepBest lesson). The remaining SortAggregates belong to
    // assignCells' max_by(struct) — the ANN-family shape, paid once
    // behind the cache.
    val p = plan("dedup_semantic")
    val scans = "InMemoryTableScan".r.findAllIn(p).length
    assert(scans >= 3, s"assigned frame must be read from cache, got $scans:\n$p")
    assert(p.contains("HashAggregate"),
      "dominator min_by must hash-aggregate — struct keys sort-aggregate")
    assert(!p.contains("CartesianProduct"),
      "the pair join must meet on the cell key, never all-pairs")
  }

  test("dedup_semantic_hier: same cached/keyed contract; routing join is broadcast") {
    // the r20 ANN-assisted path must not trade the r19 plan wins away:
    // the assigned frame still rides ONE cache barrier into both pair
    // sides + the verdict join, the dominator still hash-aggregates on
    // the single _rk key, nothing goes cartesian — and the stage-2
    // group→cell scoring joins the ≤cells-row centWithG frame as a
    // BROADCAST (a shuffled join there would put a |corpus|-row
    // exchange back on the path the route exists to narrow).
    val p = plan("dedup_semantic_hier")
    val scans = "InMemoryTableScan".r.findAllIn(p).length
    assert(scans >= 3, s"assigned frame must be read from cache, got $scans:\n$p")
    assert(p.contains("HashAggregate"),
      "dominator min_by must hash-aggregate — struct keys sort-aggregate")
    assert(!p.contains("CartesianProduct"),
      "the pair join must meet on the cell key, never all-pairs")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"the group→cell scoring must join broadcast centroid frames:\n$p")
  }
}
