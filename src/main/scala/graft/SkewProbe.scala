package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: ADVERSARIAL-SKEW scale evidence for the flagship paths.
  *
  * [[ScaleProbe]] scales volume with uniform shifted keys — the
  * realistic growth mode, but not the scale-killer mode. The class of
  * failure that kills plans at 100 TB is a HOT KEY: one pk receiving a
  * third of the changelog, one boilerplate chunk in a third of all
  * documents, one near-dup cluster spanning a third of the graph, one
  * batch flooded with copies of the same page. Each probe here builds
  * that hostile distribution explicitly, measures the operator at k=1
  * vs k=K UNDER skew (does the plan still scale?), and at equal volume
  * skewed-vs-uniform (what does the hot key itself cost — the "skew
  * tax"). A plan that survives only uniform keys shows up as a
  * super-linear skew ratio or a multi-x tax.
  *
  * Why each path is expected to hold:
  *   - compact: the pk fold is a map-side-combined HashAggregate —
  *     every partition collapses its share of the hot key to ONE
  *     buffer before the exchange, so the hot group moves ≤ |parts|
  *     rows regardless of its row share.
  *   - span dedup: keeper min is the same map-side-combined agg on the
  *     chunk digest; the dup-flag join sends the hot digest's m chunk
  *     rows to one partition — AQE's skew-join split is the mitigation.
  *   - connected components: a giant component concentrates one LABEL
  *     on a third of all nodes; rounds must stay O(log diameter) and
  *     the per-round joins lean on AQE for the hot label partition.
  *   - admission: a flooded batch used to emit C(m,2) within-batch
  *     candidate pairs (the one true quadratic); the exact-clique
  *     contraction in [[ops.Admission.admitBatch]] reduces the flood
  *     to its min-id rep BEFORE banding, so candidates stay
  *     O(collisions among distinct docs). This probe measures the
  *     mitigated path and prints the pair count the uncontracted
  *     self-join would have produced.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SkewProbe 10"
  */
object SkewProbe {
  import ProbeUtil.{time, scaled}

  /** The hot share every probe uses: ~30% of rows / docs / nodes pile
    * onto one key — past any "mild skew" regime, below the degenerate
    * all-one-key case that has no distributed answer at all. */
  private val HotPct = 30

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val want: String => Boolean =
      sys.env.get("SPARK_GRAFT_PROBES")
        .map(_.split(",").map(_.trim).toSet)
        .map(s => (n: String) => s.contains(n))
        .getOrElse(_ => true)
    val spark = Sessions.local(cpus, appName = "graft-skewprobe")

    def mat(df: DataFrame, tag: String): DataFrame =
      ProbeUtil.mat(spark, df, tag)
    def sweepBlocks(): Unit = ProbeUtil.sweepBlocks(spark)

    // ── compact under a hot pk ──────────────────────────────────────
    // events ×k, then ~30% of rows redirected onto ONE user: the pk
    // fold's hot group holds 30% of the whole changelog at every k.
    // The uniform comparator is the same volume with untouched keys.
    val ev = graft.source.Changelog.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "props", "ts")
    def hotUserPct(df: DataFrame, pct: Int): DataFrame =
      df.withColumn("user_id",
        when(pmod(xxhash64(col("event_id")), lit(100)) < pct, lit(0L))
          .otherwise(col("user_id")))
    def hotUser(df: DataFrame): DataFrame = hotUserPct(df, HotPct)
    def compactAt(n: Int, hot: Boolean): (Double, Double, Long) = {
      val base = scaled(ev, Seq("user_id", "event_id"), n)
      val in = mat(if (hot) hotUser(base) else base, s"cz$n$hot")
      val (scanSecs, _) = time(in.count())
      val log = graft.source.Changelog.fromEventsDf(in)
      val (secs, rows) = time(graft.op.Compactor.compact(log).count())
      (scanSecs, secs, rows)
    }
    if (want("skew_compact_hotpk")) {
      compactAt(1, hot = true) // warm
      val (_, c1, r1) = compactAt(1, hot = true)
      val (sck, ck, rk) = compactAt(k, hot = true)
      val (_, cu, ru) = compactAt(k, hot = false)
      val bn = if (ck - sck > sck) "pk hash-agg exchange" else "input scan"
      println(s"""{"probe":"skew_compact_hotpk","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$c1,"secs_k":$ck,"secs_k_uniform":$cu,""" +
        s""""rows_1":$r1,"rows_k":$rk,"rows_k_uniform":$ru,""" +
        s""""ratio":${ck / c1},"skew_tax":${ck / cu},""" +
        s""""bottleneck":"$bn","sf":"$sfDir"}""")
    }

    // ── span dedup under a hot chunk ────────────────────────────────
    // docs ×k suffix-salted (cross-copy chunks disjoint, the ScaleProbe
    // construction), then an 8-token boilerplate PREFIX on ~30% of
    // docs: with chunkTokens=8 the first chunk of every flagged doc is
    // the SAME digest — one chunk at 30% corpus frequency at every k.
    // The uniform comparator prefixes the same 30% with a per-doc
    // UNIQUE 8 tokens: identical volume, no hot digest.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val boiler = (1 to 8).map(i => s"boilerplate$i").mkString(" ")
    def saltedDocs(n: Int): DataFrame = ProbeUtil.saltedDocs(docs, n)
    def prefixed(d: DataFrame, hot: Boolean): DataFrame = {
      val flagged = pmod(xxhash64(col("doc_id")), lit(100)) < HotPct
      val uniq = (1 to 8).map(i =>
        concat(lit(s"u$i"), col("doc_id").cast("string"))).toSeq
      val prefix = if (hot) lit(boiler)
        else concat_ws(" ", uniq: _*)
      d.withColumn("text",
        when(flagged, concat(prefix, lit(" "), col("text")))
          .otherwise(col("text")))
    }
    def spansAt(n: Int, hot: Boolean, split: Boolean = false): (Double, Long) = {
      val d = mat(prefixed(saltedDocs(n), hot), s"sz$n$hot$split")
      val deduped =
        if (split) graft.ops.Dedup.chunkDedupHotSplit(d, "doc_id", "text",
          chunkTokens = 8, hotMin = 1000L)
        else graft.ops.Dedup.chunkDedup(d, "doc_id", "text", chunkTokens = 8)
      try time(deduped.agg(sum("dup_chunks")).head().getLong(0))
      finally sweepBlocks()
    }
    if (want("skew_spans_hotchunk")) {
      spansAt(1, hot = true) // warm
      spansAt(1, hot = true, split = true) // warm the split leg too
      val (s1, d1) = spansAt(1, hot = true)
      val (sk, dk) = spansAt(k, hot = true)
      val (su, du) = spansAt(k, hot = false)
      // the r16 mitigation candidate, priced: manual hot-digest split
      // (broadcast hot keepers + hot-free shuffle) vs the AQE skew
      // split it would replace — SAME input, output asserted identical
      val (sSplit, dSplit) = spansAt(k, hot = true, split = true)
      require(dSplit == dk,
        s"hot-split dedup diverged: $dSplit vs $dk dup chunks")
      println(s"""{"probe":"skew_spans_hotchunk","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$s1,"secs_k":$sk,"secs_k_uniform":$su,""" +
        s""""secs_k_split":$sSplit,"split_gain":${sk / sSplit},""" +
        s""""dups_1":$d1,"dups_k":$dk,"dups_k_uniform":$du,""" +
        s""""ratio":${sk / s1},"skew_tax":${sk / su},""" +
        s""""skew_tax_split":${sSplit / su},""" +
        s""""bottleneck":"hot-digest flag join (AQE skew split)","sf":"$sfDir"}""")
    }

    // ── connected components with a giant component ─────────────────
    // N×k nodes; 30% of them star-linked to node 0 (ONE component whose
    // size — and hub degree — grows with the corpus; its min label ends
    // on 30% of all nodes), the rest in 2-chains. Uniform comparator:
    // same node count and edge count (64 mini-stars, diameter 2) — only
    // the hot hub and hot min-label are gone. Rounds must stay constant
    // (star diameter 2); the hot-label join leans on AQE.
    val n0 = 100000L
    def giantAt(n: Int, giant: Boolean): (Double, Long, Map[String, Double]) = {
      val nN = n0 * n
      val hub = (nN * HotPct) / 100
      val nodes = mat(spark.range(nN).select(col("id")), s"gn$n$giant").cache()
      nodes.count()
      val star =
        if (giant) spark.range(1L, hub).select(lit(0L).as("a_id"), col("id").as("b_id"))
        else {
          // equal-volume comparator: 64 mini-stars over the SAME node
          // range with hub-64 edges (vs the giant star's hub-1 — within
          // 0.05%) and the same diameter-2 shape; only the hot hub and
          // the hot min-label are gone. A naive 2-matching here had
          // HALF the edges and inflated the reported skew tax.
          val g = math.max(hub / 64, 2)
          spark.range(1L, hub).filter(pmod(col("id"), lit(g)) =!= 0)
            .select(((col("id") / g).cast("long") * g).as("a_id"),
              col("id").as("b_id"))
        }
      val chains = spark.range(hub, nN - 1, 2)
        .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
      val edges = mat(star.unionByName(chains), s"ge$n$giant")
      try {
        PhaseClock.reset()
        val (secs, merged) = time {
          graft.ops.Clusters.components(nodes, "id", edges, "a_id", "b_id")
            .filter(col("id") =!= col("comp")).count()
        }
        (secs, merged, PhaseClock.snapshot())
      } finally { nodes.unpersist(); sweepBlocks() }
    }
    if (want("skew_cc_giant")) {
      giantAt(1, giant = true) // warm
      val (c1, m1, p1) = giantAt(1, giant = true)
      val (ckk, mk, pk) = giantAt(k, giant = true)
      val (cu, mu, _) = giantAt(k, giant = false)
      println(s"""{"probe":"skew_cc_giant","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$c1,"secs_k":$ckk,"secs_k_uniform":$cu,""" +
        s""""merged_1":$m1,"merged_k":$mk,"merged_k_uniform":$mu,""" +
        s""""rounds_1":${p1.getOrElse("cc.rounds", 0.0)},""" +
        s""""rounds_k":${pk.getOrElse("cc.rounds", 0.0)},""" +
        s""""ratio":${ckk / c1},"skew_tax":${ckk / cu},""" +
        s""""bottleneck":"hot-label propagate join (AQE skew split)","sf":"$sfDir"}""")
    }

    // ── admission under a per-batch flood ───────────────────────────
    // docs ×k; ~30% of every batch is the SAME 40-token page (the
    // boilerplate flood — the distribution that used to cost C(m,2)
    // within-batch pairs). Uniform comparator: the same 30% carry
    // per-doc UNIQUE 40-token texts. 4 sequential batches against a
    // growing store, the ScaleProbe stateful shape.
    val flood40 = (1 to 40).map(i => s"flood$i").mkString(" ")
    def floodDocs(n: Int, hot: Boolean): DataFrame = {
      val flagged = pmod(xxhash64(col("doc_id")), lit(100)) < HotPct
      val uniq = (1 to 40).map(i =>
        concat(lit(s"f$i"), col("doc_id").cast("string"))).toSeq
      val text = if (hot) lit(flood40) else concat_ws(" ", uniq: _*)
      saltedDocs(n).withColumn("text",
        when(flagged, text).otherwise(col("text")))
    }
    def admitAt(n: Int, hot: Boolean): (Double, Long, Map[String, Double]) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-skew-adm$n$hot")
      val cfg = graft.ops.Admission.Config(
        target = dir.resolve("store").toString,
        checkpoint = dir.resolve("ckpt").toString)
      val d = mat(floodDocs(n, hot), s"az$n$hot")
      PhaseClock.reset()
      val (secs, admitted) = time {
        (0 until 4).map { b =>
          graft.ops.Admission.admitBatch(
            d.filter(pmod(col("doc_id"), lit(4)) === b), cfg, b.toLong)
        }.sum
      }
      val ph = PhaseClock.snapshot()
      sweepBlocks()
      (secs, admitted, ph)
    }
    if (want("skew_admit_flood")) {
      admitAt(1, hot = true) // warm
      val (a1, ad1, _) = admitAt(1, hot = true)
      val (ak, adk, phk) = admitAt(k, hot = true)
      val (au, adu, _) = admitAt(k, hot = false)
      // what the uncontracted self-join would have emitted at k — the
      // pre-distinct join output rows the contraction removed: per
      // batch, every band bucket holding the m flood docs yields
      // C(m,2) ordered pairs, across 4 bands. m counted from the data,
      // not assumed from the fixture size.
      val dK = mat(floodDocs(k, hot = true), "azcount")
      val uncontracted = dK.filter(col("text") === flood40)
        .groupBy(pmod(col("doc_id"), lit(4)).as("b")).count()
        .collect().map(_.getLong(1)).map(m => 4L * m * (m - 1) / 2).sum
      val ph = phk.toSeq.sortBy(-_._2).take(4)
        .map { case (n2, v) => s""""$n2":$v""" }.mkString(",")
      val counterPhases = Set("batches")
      val bn = phk.filter(p => !counterPhases(p._1))
        .toSeq.sortBy(-_._2).headOption.map(_._1).getOrElse("none")
      println(s"""{"probe":"skew_admit_flood","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$a1,"secs_k":$ak,"secs_k_uniform":$au,""" +
        s""""admitted_1":$ad1,"admitted_k":$adk,"admitted_k_uniform":$adu,""" +
        s""""ratio":${ak / a1},"skew_tax":${ak / au},""" +
        s""""uncontracted_selfjoin_rows_k":$uncontracted,""" +
        s""""phases_k":{$ph},"bottleneck":"$bn","sf":"$sfDir"}""")
    }

    // ── skewed fact⋈dim join: the AQE split switch, measured ────────
    // The raw two-sided shuffle join under the same 30%-hot key — the
    // one path above that only *leans on* AQE. Here the mitigation
    // switch itself is measured: identical data and plan, adaptive
    // skew split OFF (hot partition sorts+joins 30% of the fact on ONE
    // task) vs ON (split into advisory-size chunks, dim side
    // replicated), with the ON leg's executed plan checked for the
    // actual `skew=true` marker. Thresholds scale with the probe data
    // (the defaults target 256 MB partitions).
    if (want("skew_join_aqe")) {
      // The dim side must be MATERIALIZED, not derived in-plan: a
      // distinct() built over the fact arrives at the join already
      // partitioned on user_id (its agg exchange satisfies the join's
      // requirement), and OptimizeSkewedJoin only applies when BOTH
      // children are raw shuffle reads it can split/replicate — an
      // in-plan dim silently disables the mitigation (measured here:
      // the ON leg's plan carried no skew=true until the dim was
      // staged to parquet). At 100 TB the lesson is the same: derive
      // skew-facing dimension tables into storage first.
      def joinLeg(fact: DataFrame, dim: DataFrame, split: Boolean)
          : (Double, Seq[Seq[Any]], Boolean) = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", split.toString)
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
        // decimal accumulation: the split changes which partial sums
        // meet, and an IEEE double sum would differ between legs by
        // rounding alone — exact decimal makes answer equality a real
        // check instead of a flaky one
        val j = fact.join(dim, "user_id")
          .groupBy("event_type")
          .agg(sum((col("value") * col("w")).cast("decimal(28,6)")).as("s"),
            count(lit(1)).as("c"))
        val qe = j.queryExecution
        val (secs, _) = time(qe.executedPlan.execute().count())
        val plan = qe.executedPlan.toString
        if (sys.env.contains("SPARK_GRAFT_DEBUG_PLAN")) println(plan)
        // the VALUES, not the group count — a split that dropped or
        // duplicated fact rows must fail the equality require below
        val res = j.orderBy("event_type").collect().map(_.toSeq).toSeq
        (secs, res, plan.contains("skew=true"))
      }
      def dimOf(fact: DataFrame, tag: String): DataFrame =
        mat(fact.select("user_id").distinct()
          .withColumn("w", pmod(xxhash64(col("user_id")), lit(97))), tag)
      val f1 = mat(hotUser(scaled(ev, Seq("user_id", "event_id"), 1)), "jz1")
      val d1 = dimOf(f1, "jd1")
      joinLeg(f1, d1, split = true) // warm
      val (s1, _, _) = joinLeg(f1, d1, split = true)
      val fk = mat(hotUser(scaled(ev, Seq("user_id", "event_id"), k)), s"jz$k")
      val dk = dimOf(fk, s"jd$k")
      // warm BOTH k legs before timing either — the measured pair must
      // differ only by the switch, not by who paid the page-cache fill
      joinLeg(fk, dk, split = false); joinLeg(fk, dk, split = true)
      val (sOff, rOff, mOff) = joinLeg(fk, dk, split = false)
      val (sOn, rOn, mOn) = joinLeg(fk, dk, split = true)
      require(rOn == rOff, s"split changed the answer: $rOn vs $rOff")
      require(mOn, "ON leg's executed plan carries no skew=true marker — " +
        "the probe would be timing two identical plans")
      println(s"""{"probe":"skew_join_aqe","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$s1,"secs_k_split":$sOn,"secs_k_nosplit":$sOff,""" +
        s""""split_seen":$mOn,"nosplit_marker":$mOff,""" +
        s""""ratio":${sOn / s1},"mitigation_gain":${sOff / sOn},""" +
        s""""bottleneck":"hot user_id join partition","sf":"$sfDir"}""")
      sweepBlocks()
    }

    // ── per-key capping under a hot key: salted two-phase vs naive,
    // at TWO skew intensities — the mitigation has a measured
    // crossover, not a blanket win. The salted form pays a second
    // (pruned) window pass as insurance; with near-uniform per-key
    // counts phase 1 barely prunes, so at moderate skew the naive
    // single window (whose hot task sorts hot_pct of the corpus) can
    // still be cheaper. As the hot share grows, the naive leg's wall
    // becomes that ONE task's sort while phase 1 prunes the hot key
    // to n·salts rows — the regime capPerKey exists for. Both legs'
    // selections are checksum-required equal (MixingPropSpec proves
    // the algebra; this witnesses it at probe scale).
    if (want("skew_cap")) {
      sealed trait Leg
      case object Naive extends Leg; case object SaltAll extends Leg
      case object HotAware extends Leg
      def capLeg(fact: DataFrame, leg: Leg): (Double, (Long, Long)) = {
        val out = leg match {
          case Naive =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("user_id")
              .orderBy(col("value").desc, col("event_id").asc)
            fact.withColumn("rk", row_number().over(w).cast("long"))
              .filter(col("rk") <= 5)
          case SaltAll => graft.ops.Mixing.capPerKey(fact, "user_id",
            "value", "event_id", n = 5)
          case HotAware => graft.ops.Mixing.capPerKey(fact, "user_id",
            "value", "event_id", n = 5, hotKeys = Seq(0L))
        }
        time {
          val r = out.agg(count(lit(1)).cast("long").as("c"),
            sum(col("event_id")).cast("long").as("s")).head()
          (r.getLong(0), r.getLong(1))
        }
      }
      def atPct(pct: Int): (Double, Double, Double, Long) = {
        val fk = mat(hotUserPct(scaled(ev, Seq("user_id", "event_id"), k), pct),
          s"cz$k-$pct")
        Seq(Naive, SaltAll, HotAware).foreach(capLeg(fk, _)) // warm all
        val (cnK, rn) = capLeg(fk, Naive)
        val (csK, rs) = capLeg(fk, SaltAll)
        val (chK, rh) = capLeg(fk, HotAware)
        require(rn == rs && rn == rh,
          s"capping legs disagree: naive=$rn saltAll=$rs hotAware=$rh")
        sweepBlocks()
        (cnK, csK, chK, rn._1)
      }
      val f1 = mat(hotUser(scaled(ev, Seq("user_id", "event_id"), 1)), "cz1")
      capLeg(f1, HotAware) // warm
      val (c1, _) = capLeg(f1, HotAware)
      val (nMid, sMid, hMid, keptMid) = atPct(HotPct)
      val (nHi, sHi, hHi, keptHi) = atPct(90)
      // the bottleneck is a MEASURED verdict, not an assumption: at
      // in-memory hot-partition sizes the naive leg's single-task sort
      // can stay cheaper than the mitigation's second exchange
      val bn = if (nHi > hHi) "hot-key window sort (naive leg)"
        else "mitigation second exchange (salted legs)"
      println(s"""{"probe":"skew_cap","k":$k,""" +
        s""""secs_1":$c1,"ratio":${hMid / c1},""" +
        s""""hot30_naive":$nMid,"hot30_salt_all":$sMid,"hot30_hot_aware":$hMid,""" +
        s""""kept_hot30":$keptMid,""" +
        s""""hot90_naive":$nHi,"hot90_salt_all":$sHi,"hot90_hot_aware":$hHi,""" +
        s""""kept_hot90":$keptHi,""" +
        s""""hot_aware_vs_naive_hot90":${nHi / hHi},""" +
        s""""bottleneck":"$bn","sf":"$sfDir"}""")
    }

    // ── PageRank under a hot in-link node ───────────────────────────
    // The lineitem-derived edge list ×k (disjoint copies), then ~30%
    // of ALL edges re-pointed at ONE node — the 30%-of-the-web-links-
    // to-one-page distribution. The claim under test is the scaladoc's
    // ([[ops.Graphs.pageRank]]): the per-round message sum to dst is a
    // map-side-combined long HashAggregate, so the hot node receives
    // one partial per upstream partition and the skew tax stays ~1;
    // the loop's shuffled JOIN key is src (out-edges untouched —
    // uniform), so no hot join partition exists to split. Uniform
    // comparator: identical volume, dsts untouched.
    if (want("skew_pagerank_hotdst")) {
      val eBase = ProbeUtil.partEdges(spark, sfDir)
      def scaledEdges(n: Int): DataFrame = ProbeUtil.sharedSpanCopies(eBase, n)
      def prAt(n: Int, hot: Boolean): (Double, Long, Map[String, Double]) = {
        val e0 = scaledEdges(n)
        // per-edge redirect (not per-dst relabel): collapse of same-src
        // redirected duplicates is rare at avg out-degree, so hot and
        // uniform legs carry ~identical |E|
        val e = if (hot) e0.withColumn("dst",
            when(pmod(xxhash64(col("src"), col("dst")), lit(100)) < HotPct,
              lit(0L)).otherwise(col("dst")))
          else e0
        val in = mat(e, s"pr$n$hot")
        PhaseClock.reset()
        val (secs, nodes) = time(
          graft.ops.Graphs.pageRank(in, "src", "dst", iterations = 3).count())
        val ph = PhaseClock.snapshot()
        sweepBlocks()
        (secs, nodes, ph)
      }
      prAt(1, hot = true) // warm
      val (p1, n1, _) = prAt(1, hot = true)
      val (pk, nk, phk) = prAt(k, hot = true)
      val (pu, nu, _) = prAt(k, hot = false)
      val loopS = phk.getOrElse("pr.round", 0.0)
      val prepS = phk.getOrElse("pr.edges", 0.0)
      val bn = if (loopS > prepS) "per-round msg join+sum (pr.round)"
        else "edge/out-degree prep (pr.edges)"
      println(s"""{"probe":"skew_pagerank_hotdst","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$p1,"secs_k":$pk,"secs_k_uniform":$pu,""" +
        s""""nodes_1":$n1,"nodes_k":$nk,"nodes_k_uniform":$nu,""" +
        s""""prep_k":$prepS,"loop_k":$loopS,""" +
        s""""ratio":${pk / p1},"skew_tax":${pk / pu},""" +
        s""""bottleneck":"$bn","sf":"$sfDir"}""")
    }

    // ── Triangle counting under a hub node ──────────────────────────
    // Same edge list ×k, then ~30% of edges re-pointed at ONE node —
    // a hub of degree ≈ 0.3·|E|. This is THE op the naive plan cannot
    // survive: wedge enumeration at the hub is degree² (reported below
    // as wedges_naive, computed from the degree distribution — running
    // it would be the quadratic blowup itself). The claim under test
    // is the scaladoc's: degree orientation moves every hub wedge to
    // the hub's (many, low-degree) neighbors, so the ENUMERATED wedge
    // count stays near the uniform leg's and the hub pays a bounded
    // tax. wedges_oriented is measured from the op's own oriented
    // out-degrees; the timed legs run the full gated operator.
    if (want("skew_triangles_hub")) {
      val eBase = ProbeUtil.partEdges(spark, sfDir)
      def edgesAt(n: Int, hot: Boolean): DataFrame = {
        val e0 = ProbeUtil.sharedSpanCopies(eBase, n)
        val e = if (hot) e0.withColumn("dst",
            when(pmod(xxhash64(col("src"), col("dst")), lit(100)) < HotPct,
              lit(0L)).otherwise(col("dst")))
          else e0
        mat(e, s"tri$n$hot")
      }
      def triAt(in: DataFrame): (Double, Long, Map[String, Double]) = {
        PhaseClock.reset()
        val (secs, nodes) = time(
          graft.ops.Graphs.triangles(in, "src", "dst").count())
        val ph = PhaseClock.snapshot()
        sweepBlocks()
        (secs, nodes, ph)
      }
      /** (Σ deg·(deg−1)/2) under f's degree notion — the wedge count a
        * plan enumerating pairs at f's key would generate. */
      def wedgeCount(edges: DataFrame, bySource: Boolean): Long = {
        val und = graft.ops.Graphs.simpleUndirected(edges, "src", "dst")
        val d =
          if (bySource) {
            val deg = graft.ops.Graphs.degreesOf(und)
            graft.ops.Graphs.orientEdges(und, deg)
              .groupBy("s").agg(count(lit(1)).as("degree"))
          } else graft.ops.Graphs.degreesOf(und)
        val r = d.agg(sum(expr(
          "CAST(degree AS DECIMAL(38,0)) * CAST(degree - 1 AS DECIMAL(38,0))"))
        ).head()
        val tot = if (r.isNullAt(0)) BigInt(0) else BigInt(r.getDecimal(0).toBigInteger)
        (tot / 2).toLong
      }
      triAt(edgesAt(1, hot = true)) // warm
      val (t1, _, _) = triAt(edgesAt(1, hot = true))
      val hotK = edgesAt(k, hot = true)
      val wNaive = wedgeCount(hotK, bySource = false)
      val wOrient = wedgeCount(hotK, bySource = true)
      sweepBlocks()
      val (tk, nk, phk) = triAt(hotK)
      val uniK = edgesAt(k, hot = false)
      val wUni = wedgeCount(uniK, bySource = true)
      sweepBlocks()
      val (tu, nu, _) = triAt(uniK)
      val orientS = phk.getOrElse("tri.orient", 0.0)
      val countS = phk.getOrElse("tri.count", 0.0)
      val bn = if (countS > orientS) "wedge join + corner count (tri.count)"
        else "orientation prep (tri.orient)"
      println(s"""{"probe":"skew_triangles_hub","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$t1,"secs_k":$tk,"secs_k_uniform":$tu,""" +
        s""""nodes_k":$nk,"nodes_k_uniform":$nu,""" +
        s""""wedges_naive_k":$wNaive,"wedges_oriented_k":$wOrient,""" +
        s""""wedges_oriented_uniform_k":$wUni,""" +
        s""""orient_reduction":${wNaive.toDouble / math.max(wOrient, 1L)},""" +
        s""""orient_k":$orientS,"count_k":$countS,""" +
        s""""ratio":${tk / t1},"skew_tax":${tk / tu},""" +
        s""""bottleneck":"$bn","sf":"$sfDir"}""")
    }

    // ── k-core peeling under a hub node ─────────────────────────────
    // Edge list ×k, ~30% of edges re-pointed at ONE node (the
    // triangle probe's hub construction). The path no other probe
    // covers: the per-round node-keyed SEMI-JOINS — the hub's 0.3·|E|
    // edge rows all carry the same u, so a shuffled semi-join would
    // put them on one task (the keep side is per-NODE, so Spark
    // broadcasts it while it fits; at 100-TB node counts it shuffles
    // and the AQE skew split is the mitigation). Degree agg is the
    // usual map-side-combined hub argument. Uniform comparator:
    // same volume, untouched keys.
    if (want("skew_kcore_hub")) {
      val eBase = ProbeUtil.partEdges(spark, sfDir)
      def kcoreAt(n: Int, hot: Boolean): (Double, Long, Map[String, Double]) = {
        val e0 = ProbeUtil.sharedSpanCopies(eBase, n)
        val e = if (hot) e0.withColumn("dst",
            when(pmod(xxhash64(col("src"), col("dst")), lit(100)) < HotPct,
              lit(0L)).otherwise(col("dst")))
          else e0
        val in = mat(e, s"kc$n$hot")
        PhaseClock.reset()
        val r = time(graft.ops.Graphs.kCorePeel(in, "src", "dst",
          k = 3, rounds = 3).count())
        val ph = PhaseClock.snapshot()
        sweepBlocks()
        (r._1, r._2, ph)
      }
      kcoreAt(1, hot = true) // warm
      val (c1, n1, _) = kcoreAt(1, hot = true)
      val (ck, nk, phk) = kcoreAt(k, hot = true)
      val (cu, nu, _) = kcoreAt(k, hot = false)
      val peelS = phk.getOrElse("kcore.peel", 0.0)
      println(s"""{"probe":"skew_kcore_hub","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$c1,"secs_k":$ck,"secs_k_uniform":$cu,""" +
        s""""core_1":$n1,"core_k":$nk,"core_k_uniform":$nu,""" +
        s""""peel_k":$peelS,""" +
        s""""ratio":${ck / c1},"skew_tax":${ck / cu},""" +
        s""""bottleneck":"degree agg + semi-join peel (kcore.peel)","sf":"$sfDir"}""")
    }

    // ── Funnel under a hot user ─────────────────────────────────────
    // events ×k, then ~30% of all rows redirected onto ONE user: that
    // user's event history is 30% of the corpus at every k. The
    // window form must sort that history in ONE task (the per-entity
    // numbering window) — THE hot-entity hazard; the key form
    // (stepsByKey) replaces the window with chained map-side-combined
    // min-aggs, so the hot user collapses to one buffer per partition.
    // Uniform comparator: identical volume, untouched user keys. The
    // claim under test: the key form's skew tax stays ~1 while the
    // window form pays the one-task sort.
    if (want("skew_funnel_hotuser")) {
      val fev = graft.source.Changelog.events(spark, sfDir)
        .select("user_id", "event_type", "ts_ns", "event_id")
      val stepsSeq = Seq("view", "click", "purchase")
      def funnelFrame(in: DataFrame, byKey: Boolean): DataFrame =
        if (byKey) graft.ops.Funnel.stepsByKey(
          // packedKey carries its own in-plan id<1e10 guard, so a
          // fixture+k combination whose shifted event_ids cross a ts
          // boundary fails LOUDLY instead of silently comparing a
          // reordered funnel against the window form
          in.withColumn("k",
            graft.ops.Funnel.packedKey(col("ts_ns"), col("event_id"))),
          "user_id", "event_type", stepsSeq, "k")
        else graft.ops.Funnel.steps(in, "user_id", "event_type",
          stepsSeq, Seq("ts_ns", "event_id"))
      // the A/B claim is a PLAN difference — refuse to time two legs
      // that plan the same way (the playbook's identical-plans trap)
      locally {
        val pw = funnelFrame(fev, byKey = false)
          .queryExecution.executedPlan.toString
        val pk = funnelFrame(fev, byKey = true)
          .queryExecution.executedPlan.toString
        require(pw.contains("Window") && !pk.contains("Window"),
          "funnel probe legs lost their distinguishing plan shape " +
            "(window form must contain Window; key form must not)")
      }
      def funnelAt(n: Int, hot: Boolean, byKey: Boolean): (Double, Long) = {
        val base = scaled(fev, Seq("user_id", "event_id"), n)
        val in = mat(if (hot) hotUserPct(base, HotPct) else base, s"fn$n$hot")
        val r = time(funnelFrame(in, byKey).count())
        sweepBlocks()
        r
      }
      funnelAt(1, hot = true, byKey = false) // warm both legs
      funnelAt(1, hot = true, byKey = true)
      val (w1, _) = funnelAt(1, hot = true, byKey = false)
      val (wk, rwk) = funnelAt(k, hot = true, byKey = false)
      val (wu, _) = funnelAt(k, hot = false, byKey = false)
      val (kk1, _) = funnelAt(1, hot = true, byKey = true)
      val (kkk, rkk) = funnelAt(k, hot = true, byKey = true)
      val (kku, _) = funnelAt(k, hot = false, byKey = true)
      val bn = if (wk > kkk) "per-entity numbering window (one-task hot sort)"
        else "step min-agg exchange"
      println(s"""{"probe":"skew_funnel_hotuser","k":$k,"hot_pct":$HotPct,""" +
        s""""win_secs_1":$w1,"win_secs_k":$wk,"win_secs_k_uniform":$wu,""" +
        s""""key_secs_1":$kk1,"key_secs_k":$kkk,"key_secs_k_uniform":$kku,""" +
        s""""rows_k_win":$rwk,"rows_k_key":$rkk,""" +
        s""""win_ratio":${wk / w1},"key_ratio":${kkk / kk1},""" +
        s""""win_tax":${wk / wu},"key_tax":${kkk / kku},""" +
        s""""win_over_key":${wk / kkk},""" +
        s""""bottleneck":"$bn","sf":"$sfDir"}""")
    }

    // ── retention under a hot user ──────────────────────────────────
    // events ×k with ~30% of rows redirected onto ONE user (the
    // hot-entity hazard for the r18 single-exchange shape: cohort min
    // + collect_set of periods in one entity agg). The claim: the hot
    // user's events collapse in the MAP-SIDE partial — each partition
    // contributes one ≤|periods| set, and the reduce-side merge is
    // bounded by distinct periods (≤ horizon/period, ~30 here), not
    // by the 30% event share. Uniform comparator: same volume,
    // untouched user keys. Tax ≈ 1 or the shape is wrong.
    if (want("skew_retention_hotuser")) {
      val period = 86400L * 1000000000L
      val rev = graft.source.Changelog.events(spark, sfDir)
        .select("user_id", "ts_ns", "event_id")
      def retAt(n: Int, hot: Boolean, agg: Boolean): (Double, Long) = {
        val base = scaled(rev, Seq("user_id", "event_id"), n)
        val in = mat(if (hot) hotUser(base) else base, s"rt$n$hot$agg")
        val frame =
          if (agg) graft.ops.Retention.cohorts(in, "user_id", "ts_ns", period)
          else graft.ops.Retention.cohortsJoin(in, "user_id", "ts_ns", period)
        val r = time(frame.count())
        sweepBlocks()
        r
      }
      retAt(1, hot = true, agg = true) // warm both shapes
      retAt(1, hot = true, agg = false)
      val (r1, _) = retAt(1, hot = true, agg = true)
      val (rk, cellsK) = retAt(k, hot = true, agg = true)
      val (ru, cellsU) = retAt(k, hot = false, agg = true)
      val (jk, _) = retAt(k, hot = true, agg = false)
      val (ju, _) = retAt(k, hot = false, agg = false)
      println(s"""{"probe":"skew_retention_hotuser","k":$k,"hot_pct":$HotPct,""" +
        s""""hot_secs_1":$r1,"hot_secs_k":$rk,"uniform_secs_k":$ru,""" +
        s""""join_hot_secs_k":$jk,"join_uniform_secs_k":$ju,""" +
        s""""cells_hot_k":$cellsK,"cells_uniform_k":$cellsU,""" +
        s""""hot_ratio":${rk / r1},"hot_tax":${rk / ru},""" +
        s""""join_hot_tax":${jk / ju},"hot_agg_over_join":${rk / jk},""" +
        s""""bottleneck":"entity agg exchange (set <= |periods|/user)",""" +
        s""""sf":"$sfDir"}""")
    }

    // ── LPA round shape under a hot label ───────────────────────────
    // The r21 "Not yet" #2 decision leg: the default LPA round is
    // join(adj × labels on nb) → groupBy(n,label) count → groupBy(n)
    // argmax — two aggregation exchanges, but the first one ships
    // PARTIAL-AGGREGATED (n,label) rows (on a hot-label graph the hot
    // label collapses map-side). The fused variant pre-partitions the
    // joined rows by n so both aggs run exchange-free — but that one
    // exchange ships RAW joined rows (no partial aggregation). A third
    // variant keeps the default round but caches the adjacency
    // PRE-PARTITIONED on the join key nb, deleting the adj-side join
    // exchange from every round. Hot leg: ~30% of edges re-pointed at
    // one hub (its label floods a third of the graph by round 2 — the
    // partial-agg-friendly regime); uniform: untouched keys.
    if (want("skew_lpa_round")) {
      val eBase = ProbeUtil.partEdges(spark, sfDir)
      def lpaAt(n: Int, hot: Boolean, shape: String): (Double, (Long, Long)) = {
        val e0 = ProbeUtil.sharedSpanCopies(eBase, n)
        val e = if (hot) e0.withColumn("dst",
            when(pmod(xxhash64(col("src"), col("dst")), lit(100)) < HotPct,
              lit(0L)).otherwise(col("dst")))
          else e0
        val in = mat(e, s"lpa$n$hot$shape")
        val r = time {
          val und = graft.ops.Graphs.simpleUndirected(in, "src", "dst")
          val adjBase = und.select(col("u").as("n"), col("v").as("nb"))
            .unionByName(und.select(col("v").as("n"), col("u").as("nb")))
          val adj = (if (shape == "adjpart") adjBase.repartition(col("nb"))
            else adjBase).cache()
          adj.count()
          var labels = adj.select(col("n")).distinct()
            .select(col("n"), col("n").as("label"))
          var live: Seq[org.apache.spark.rdd.RDD[_]] = Nil
          (1 to 3).foreach { _ =>
            val joined = adj.join(
              labels.select(col("n").as("nb"), col("label")), "nb")
            val next = shape match {
              case "fused" => joined
                .repartition(col("n"))
                .groupBy(col("n"), col("label")).agg(count(lit(1)).as("c"))
                .groupBy(col("n"))
                .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
                .select(col("n"), (-col("m.nl")).as("label"))
              case _ => graft.ops.Graphs.lpaRoundFrame(adj, labels)
            }
            val (cut, rdds, _) = graft.ops.Lineage.cut(next)
            labels = cut
            live.foreach(_.unpersist(blocking = false))
            live = rdds
          }
          val chk = labels.agg(count(lit(1)).cast("long").as("c"),
            sum(col("label")).cast("long").as("s")).head()
          adj.unpersist()
          (chk.getLong(0), chk.getLong(1))
        }
        sweepBlocks()
        r
      }
      lpaAt(1, hot = true, "default") // warm
      val (l1, c1) = lpaAt(1, hot = true, "default")
      val (lk, ck) = lpaAt(k, hot = true, "default")
      val (lf, cf) = lpaAt(k, hot = true, "fused")
      val (la, ca) = lpaAt(k, hot = true, "adjpart")
      require(cf == ck && ca == ck,
        s"LPA round shapes diverged: default=$ck fused=$cf adjpart=$ca")
      val (lu, _) = lpaAt(k, hot = false, "default")
      val (lfu, _) = lpaAt(k, hot = false, "fused")
      val (lau, _) = lpaAt(k, hot = false, "adjpart")
      println(s"""{"probe":"skew_lpa_round","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$l1,"secs_k_default":$lk,"secs_k_fused":$lf,""" +
        s""""secs_k_adjpart":$la,""" +
        s""""uniform_k_default":$lu,"uniform_k_fused":$lfu,""" +
        s""""uniform_k_adjpart":$lau,""" +
        s""""fused_over_default_hot":${lf / lk},""" +
        s""""adjpart_over_default_hot":${la / lk},""" +
        s""""bottleneck":"round agg exchanges vs raw-row repartition",""" +
        s""""sf":"$sfDir"}""")
    }

    // ── BFS from a hub seed ─────────────────────────────────────────
    // Edge list ×k, then ~30% of edge SOURCES re-pointed at ONE node:
    // a hub holding 30% of all out-edges. Seeding AT the hub makes
    // round 1 expand 30% of |E| from a single frontier node — the
    // frontier side broadcasts (it's tiny), so those edge rows are
    // scanned in place and the distinct partial-aggregates map-side;
    // nothing concentrates on one task. Equal-WORK uniform comparator:
    // same untouched graph, seeded at a ~30% random subset of sources
    // (the same round-1 out-edge volume, spread over many seeds).
    if (want("skew_bfs_hub")) {
      val eBase = ProbeUtil.partEdges(spark, sfDir)
      // the r16 mitigation candidate, priced: two-phase SALTED frontier
      // distinct — phase 1 pre-aggregates on (salt, dst) where the salt
      // is ROW-VARYING (hash of the SOURCE endpoint, which differs
      // across a dst group's rows — a salt that's a function of the
      // grouping key would land the hot group on one reducer anyway,
      // the strawman a review caught in this probe's first cut), then
      // the final distinct on dst. The hypothesis to refute: the
      // default distinct's map-side partial aggregation already does
      // this work, so salting only adds an exchange.
      def saltedRound(salts: Int)(frontier: org.apache.spark.sql.DataFrame,
          e: org.apache.spark.sql.DataFrame,
          dist: org.apache.spark.sql.DataFrame, i: Int)
          : org.apache.spark.sql.DataFrame =
        frontier
          .join(e.select(col("src").as("n"), col("dst")), "n")
          // input cols here are (n = the SOURCE endpoint, dst): salt on
          // the source, which varies across a dst group's rows
          .select(col("dst").as("n"),
            pmod(xxhash64(col("n")), lit(salts)).as("_s0"))
          .groupBy(col("_s0"), col("n"))
          .agg(count(lit(1))).select(col("n")).distinct()
          .withColumn("dist", lit(i).cast("long"))
          .join(dist, Seq("n"), "left_anti")
      def bfsAt(n: Int, hot: Boolean, salted: Boolean = false)
          : (Double, Long, Map[String, Double]) = {
        val e0 = ProbeUtil.sharedSpanCopies(eBase, n)
        val e = if (hot) e0.withColumn("src",
            when(pmod(xxhash64(col("src"), col("dst")), lit(100)) < HotPct,
              lit(0L)).otherwise(col("src")))
          else e0
        val in = mat(e, s"bfs$n$hot$salted")
        val seeds =
          if (hot) spark.range(1).select(lit(0L).as("seed"))
          else in.select(col("src").as("seed"))
            .filter(pmod(xxhash64(col("seed")), lit(100)) < HotPct)
        PhaseClock.reset()
        // construction INSIDE the clock: bfsLevels executes its rounds
        // eagerly (lineage cuts), so timing only .count() would measure
        // a read of the final cut, not the BFS
        val r = time {
          val run =
            if (salted) graft.ops.Graphs.bfsLevelsImpl(in, "src", "dst",
              seeds, "seed", 3, saltedRound(64))
            else graft.ops.Graphs.bfsLevels(in, "src", "dst",
              seeds, "seed", maxDepth = 3)
          run.count()
        }
        val ph = PhaseClock.snapshot()
        sweepBlocks()
        (r._1, r._2, ph)
      }
      bfsAt(1, hot = true) // warm
      bfsAt(1, hot = true, salted = true) // warm the salted leg too
      val (b1, n1, _) = bfsAt(1, hot = true)
      val (bk, nk, phk) = bfsAt(k, hot = true)
      val (bu, nu, _) = bfsAt(k, hot = false)
      val (bs, ns2, _) = bfsAt(k, hot = true, salted = true)
      require(ns2 == nk, s"salted BFS diverged: reached $ns2 vs $nk")
      val prepS = phk.getOrElse("bfs.edges", 0.0)
      val loopS = phk.getOrElse("bfs.round", 0.0)
      val bn = if (loopS > prepS) "frontier join + distinct (bfs.round)"
        else "edge dedup prep (bfs.edges)"
      println(s"""{"probe":"skew_bfs_hub","k":$k,"hot_pct":$HotPct,""" +
        s""""secs_1":$b1,"secs_k":$bk,"secs_k_uniform":$bu,""" +
        s""""secs_k_salted":$bs,"salt_gain":${bk / bs},""" +
        s""""reached_1":$n1,"reached_k":$nk,"reached_k_uniform":$nu,""" +
        s""""prep_k":$prepS,"loop_k":$loopS,""" +
        s""""ratio":${bk / b1},"skew_tax":${bk / bu},""" +
        s""""skew_tax_salted":${bs / bu},""" +
        s""""bottleneck":"$bn","sf":"$sfDir"}""")
    }

    spark.stop()
  }
}
