package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream — the second classic
  * sequential-analytics shape next to [[Funnel]] (reference scope: its
  * event tables only route/compact rows; retention is the analytics
  * layer a warehouse adds on top): bucket each entity by the period of
  * its FIRST activity (the cohort), then count, for every (cohort,
  * offset) cell, how many of that cohort's entities were active
  * `offset` periods later. The training-data twin is crawl-source
  * freshness: of the domains first seen in week c, how many still
  * yield documents at week c+n.
  *
  * Exact integer arithmetic end to end: periods are `tsNs div
  * periodNs` — integer division TRUNCATING TOWARD ZERO, matching
  * DuckDB `//` on integers, so the oracle replays the identical
  * bucketing and the gate hash-compares every cell. Timestamps are
  * assumed non-negative (post-1970): for negative epochs truncation
  * would give period 0 a double width, so pre-epoch data needs an
  * explicit offset before bucketing. Rows with a NULL entity or
  * timestamp are dropped (an unplaceable activity has no cell).
  *
  * Scale shape: one map-side-combined min-agg per entity (the cohort
  * assignment), one entity-keyed equi-join to re-attach it, one
  * (cohort, offset) count-distinct — which Spark plans as two hash
  * aggs (dedup on (cohort, offset, entity), then count). Every
  * exchange is keyed on the entity or the cell; nothing is windowed,
  * nothing collects. A hot entity costs one min buffer per partition;
  * a hot CELL (everyone active at offset 0) costs one count buffer
  * per partition after the dedup agg — both map-side-bounded. The
  * entity-keyed join and the min-agg share their partitioning, so AQE
  * folds them onto one exchange of the deduped (entity, period) set —
  * ≤ |entities|·|periods| rows, not |events|. */
object Retention {

  def cohorts(events: DataFrame, entityCol: String, tsNsCol: String,
      periodNs: Long): DataFrame = {
    require(periodNs > 0, s"periodNs must be positive (got $periodNs)")
    // integer `div`, never `/`: Column `/` is DOUBLE division, and an
    // ns-epoch (~1.7e18) exceeds double's 53-bit mantissa — floor(x/y)
    // would mis-bucket events near period boundaries
    val act = events
      .select(col(entityCol).as("_ent"),
        col(tsNsCol).cast("long").as("_t"))
      .withColumn("_p", expr(s"_t div ${periodNs}L"))
      .select(col("_ent"), col("_p"))
      .filter(col("_ent").isNotNull && col("_p").isNotNull)
      .distinct() // activity is per-period: collapse BEFORE the join
    val first = act.groupBy(col("_ent")).agg(min(col("_p")).as("cohort"))
    act.join(first, "_ent")
      .groupBy(col("cohort"), (col("_p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
