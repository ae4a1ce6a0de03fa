package graft.queries

import org.apache.spark.sql.functions._
import graft.source.Changelog.table
import graft.ops.Sketches

/** Mergeable-sketch queries: approximate distinct counts and quantiles
  * whose estimates are verified IN-ENGINE against the exact aggregate
  * on the same data (the `ann_recall` pattern — the oracle-checked
  * columns are the exact values, the sketch legs gate as boolean
  * flags that must come back true). */
object SketchQueries {

  val defs: Map[String, QueryDef] = Map(

    // Per-language distinct-document profile: exact COUNT(DISTINCT fp)
    // (the oracle-checked value) next to the HLL(12) estimate's 5%
    // error flag. At 100 TB the exact leg is the one that gets
    // dropped: the sketch aggregates into 4 KB of registers per group
    // map-side, where COUNT DISTINCT shuffles every distinct value.
    "sketch_distinct" -> QueryDef(
      (s, dir) => {
        Sketches.distinctProfile(
          table(s, dir, "documents").withColumn("fp", md5(col("text"))),
          "lang", "fp")
          .orderBy("lang")
      },
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS exact_distinct,
        |  TRUE AS est_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Incremental distinct over OVERLAPPING batches through a persisted
    // sketch store: slices doc_id%m=0 for m in 2..5 re-deliver shared
    // docs on purpose — HLL union is idempotent (per-register max), so
    // re-delivered rows cannot double-count, which is exactly what
    // summing per-batch exact counts gets wrong. The refresh reads the
    // sketch store only (groups × batches rows), never the corpus.
    "sketch_incr" -> QueryDef(
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-sketch-store")
        try {
          val docs = table(s, dir, "documents")
            .withColumn("fp", md5(col("text")))
          (2 to 5).foreach { m =>
            Sketches.appendSketches(s"$tmp/store",
              Sketches.sketchBatch(
                docs.filter(col("doc_id") % m === 0), "lang", "fp", m - 2L))
          }
          val merged = Sketches.mergedDistinct(s, s"$tmp/store", "lang")
          // exact over the union of slices (%4=0 is subsumed by %2=0)
          val exact = docs
            .filter(col("doc_id") % 2 === 0 || col("doc_id") % 3 === 0 ||
              col("doc_id") % 5 === 0)
            .groupBy("lang")
            .agg(countDistinct(col("fp")).cast("long").as("exact_distinct"))
          val res = exact.join(merged, "lang")
            .select(col("lang"), col("exact_distinct"), col("n_batches"),
              (abs(col("merged_est") - col("exact_distinct")) <=
                col("exact_distinct") * 0.05).as("merged_ok"))
            .orderBy("lang")
          val rows = res.collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
        } finally Registry.rmTree(tmp.toFile)
      },
      Some("""WITH sl AS (
        |  SELECT lang, m FROM documents, (VALUES (2),(3),(4),(5)) AS v(m)
        |  WHERE doc_id % m = 0)
        |SELECT d.lang,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS exact_distinct,
        |  (SELECT CAST(COUNT(DISTINCT m) AS BIGINT) FROM sl
        |   WHERE sl.lang = d.lang) AS n_batches,
        |  TRUE AS merged_ok
        |FROM documents d
        |WHERE doc_id % 2 = 0 OR doc_id % 3 = 0 OR doc_id % 5 = 0
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin)),

    // Cross-corpus overlap WITHOUT a join: |A∩B| by inclusion-exclusion
    // over three HLL legs (A = even docs, B = doc_id%3, sharing every
    // 6th doc plus cross-copy text dups). Each corpus collapses
    // map-side to ONE sketch row — at 100 TB this replaces the
    // join-based overlap entirely. The oracle checks the EXACT legs
    // (DuckDB computes the true intersection with a join); the sketch
    // overlap must land within 5% of the union + 1 to flag true.
    "sketch_overlap" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents").withColumn("fp", md5(col("text")))
        val inA = col("doc_id") % 2 === 0
        val inB = col("doc_id") % 3 === 0
        val est = Sketches.overlapEstimate(
          docs.filter(inA), docs.filter(inB), "fp")
        val exact = docs.agg(
          countDistinct(when(inA, col("fp"))).cast("long").as("exact_a"),
          countDistinct(when(inB, col("fp"))).cast("long").as("exact_b"),
          countDistinct(when(inA || inB, col("fp"))).cast("long").as("exact_u"))
        exact.crossJoin(est)
          .select(col("exact_a"), col("exact_b"),
            (col("exact_a") + col("exact_b") - col("exact_u"))
              .as("exact_overlap"),
            (abs(col("est_overlap") -
              (col("exact_a") + col("exact_b") - col("exact_u"))) <=
              col("exact_u") * 0.05 + lit(1.0)).as("overlap_ok"))
      },
      Some("""WITH fa AS (SELECT DISTINCT md5(text) AS fp FROM documents
        |            WHERE doc_id % 2 = 0),
        |fb AS (SELECT DISTINCT md5(text) AS fp FROM documents
        |       WHERE doc_id % 3 = 0)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fa) AS exact_a,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM fb) AS exact_b,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM fa JOIN fb USING (fp))
        |         AS exact_overlap,
        |       TRUE AS overlap_ok""".stripMargin)),

    // The STREAMING profile: per-micro-batch sketches appended to the
    // store from inside foreachBatch while the 4-slice event stream
    // drains, then one merge across batches — distinct users per event
    // type maintained incrementally, the corpus read exactly once as
    // it streamed past. The oracle is the whole-corpus exact count.
    "stream_profile" -> QueryDef(
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-stream-prof")
        try {
          // scale-adaptive drain partitions (see StreamTuning)
          graft.streaming.StreamTuning.withDrainPartitions(
            s, Seq(s"$dir/events.parquet")) {
          val (drop, schema) = graft.streaming.ChangeStream.stageEvents(
            s, dir, slices = 4, sliceBy = "event_id")
          val raw = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(drop)
          val ev = graft.source.Changelog.normalizeTs(raw)
            .select("user_id", "event_type")
          val q = ev.writeStream
            .option("checkpointLocation", s"$tmp/ckpt")
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
               id: Long) =>
                Sketches.appendSketches(s"$tmp/st",
                  Sketches.sketchBatch(b, "event_type", "user_id", id))
                ()
            }.start()
          q.processAllAvailable(); q.stop()
          }
          val merged = Sketches.mergedDistinct(s, s"$tmp/st", "event_type")
          val exact = graft.source.Changelog.events(s, dir)
            .groupBy("event_type")
            .agg(countDistinct(col("user_id")).cast("long").as("exact_users"))
          val res = exact.join(merged, "event_type")
            .select(col("event_type"), col("exact_users"),
              (abs(col("merged_est") - col("exact_users")) <=
                col("exact_users") * 0.05 + lit(1.0)).as("merged_ok"))
            .orderBy("event_type")
          val rows = res.collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
        } finally Registry.rmTree(tmp.toFile)
      },
      Some("""SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS merged_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Heavy hitters: the top-10 event users, exact counts
    // oracle-checked, with the count-min-sketch estimate's one-sided
    // error flag — the no-shuffle hot-key detector that tells the skew
    // mitigations (salting, AQE split, capPerKey) WHERE to aim.
    "sketch_topk" -> QueryDef(
      (s, dir) => Sketches.heavyHitters(
        graft.source.Changelog.events(s, dir).select("user_id"),
        "user_id", topK = 10),
      Some("""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
        |  TRUE AS cms_ok
        |FROM events GROUP BY user_id
        |ORDER BY exact_cnt DESC, user_id LIMIT 10""".stripMargin)),

    // Per-language length quantiles: exact interpolated percentiles
    // (oracle: quantile_cont) plus the GK-sketch approximation's error
    // flag. The approx leg is the 100-TB survivor: an accuracy-bounded
    // per-partition summary merges where exact percentile sorts the
    // whole group.
    "sketch_quantile" -> QueryDef(
      (s, dir) => {
        Sketches.quantileProfile(table(s, dir, "documents"), "lang", "n_chars")
          .orderBy("lang")
      },
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  quantile_cont(n_chars, 0.25) AS q25,
        |  quantile_cont(n_chars, 0.5) AS q50,
        |  quantile_cont(n_chars, 0.75) AS q75,
        |  TRUE AS approx_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))
  )
}
