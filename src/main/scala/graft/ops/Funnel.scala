package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ordered-step funnel analysis over an event stream — the
  * MATCH_RECOGNIZE / sequential-pattern class of analytics query
  * (reference scope: its event tables only route/compact rows;
  * sequence semantics are the analytics layer a warehouse adds on
  * top): for each entity, did events of types s₁, s₂, … sₖ occur in
  * temporal order, and at which positions? The standard product
  * funnel ("view → click → purchase") and the crawl/session variant
  * ("fetch → parse → index") are both this shape.
  *
  * Semantics: positions are `row_number` over (`orderCols`) within the
  * entity — `orderCols` MUST total-order events within an entity (tie
  * ties to a unique id; an ambiguous order would make the positions
  * engine-dependent, the round-16 lead() lesson). Step i's position is
  * the MINIMUM position of a type-sᵢ event STRICTLY AFTER step i−1's
  * position (the earliest-completion convention; greedy-earliest is
  * optimal for reachability: if any assignment completes the funnel,
  * earliest-first does). Output: one row per entity that completed
  * step 1, with `p1..pk` (null once a step is unreached) and `depth` =
  * number of completed steps.
  *
  * Scale shape: k chained (filter → map-side-combined min-aggregate →
  * join) passes, ALL keyed on the entity — no arrays, no per-entity
  * collect_list (a hot entity with 10⁸ events would materialize its
  * whole history in one task under the collect-and-walk form; here it
  * costs k partial mins), and every exchange reuses the same entity
  * key so AQE folds them onto one partitioning. The event frame is
  * filtered to the step's type BEFORE each shuffle — at k steps the
  * total shuffled volume is Σ|type = sᵢ| rows, not k·|events|. The
  * position numbering itself is one per-entity window over the events
  * projected to (entity, order, type) — at 100 TB that window is the
  * dominant exchange, and it is the irreducible one (any sequential
  * semantics needs the per-entity order).
  */
object Funnel {

  def steps(events: DataFrame, entityCol: String, typeCol: String,
      stepTypes: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    require(orderCols.nonEmpty, "funnel needs an ordering")
    // window over the RENAMED key — the select below drops entityCol
    val w = Window.partitionBy("_ent").orderBy(orderCols.map(col): _*)
    val pos = events
      .select(col(entityCol).as("_ent") +: col(typeCol).as("_ty") +:
        orderCols.map(col): _*)
      .withColumn("_pos", row_number().over(w).cast("long"))
      .select(col("_ent"), col("_ty"), col("_pos"))
    // step 1: unconditional min position of the first type
    var acc = pos.filter(col("_ty") === stepTypes.head)
      .groupBy(col("_ent")).agg(min(col("_pos")).as("p1"))
    stepTypes.zipWithIndex.drop(1).foreach { case (ty, i) =>
      val prev = s"p$i"; val cur = s"p${i + 1}"
      val nextMin = pos.filter(col("_ty") === ty)
        .join(acc.select(col("_ent"), col(prev)), "_ent")
        .filter(col(prev).isNotNull && col("_pos") > col(prev))
        .groupBy(col("_ent")).agg(min(col("_pos")).as(cur))
        .select(col("_ent").as("_e2"), col(cur))
      acc = acc.join(nextMin, col("_ent") === col("_e2"), "left")
        .drop("_e2")
    }
    val depth = stepTypes.indices.map(i => col(s"p${i + 1}").isNotNull)
      .map(c => when(c, 1L).otherwise(0L)).reduce(_ + _)
    acc.withColumn("depth", depth)
      .withColumnRenamed("_ent", entityCol)
  }

  /** [[steps]] without the position window — the hot-entity scale
    * form. `keyCol` must be a UNIQUE, totally-ordered column within
    * each entity (pack the timestamp and a unique id into one
    * comparable value; exact integer packing keeps it engine-portable).
    * Step i's key is the MIN key of a type-sᵢ event strictly after
    * step i−1's key — the same greedy-earliest semantics, compared on
    * keys instead of positions, so the SAME events are chosen and
    * `depth` is identical; only the reported coordinate differs
    * (k1..kk are keys, not indices).
    *
    * Scale shape: the whole funnel is k chained map-side-combined
    * min-aggregates + equi-joins on the entity key — NO window
    * anywhere in the plan (PlanSpec pins Window-free). [[steps]]'s
    * per-entity numbering window must sort a hot entity's entire
    * history in ONE task (30% of a 100-TB corpus on one user = one
    * executor sorting 30 TB); here the hot entity collapses to one
    * agg buffer per partition before anything moves, so its cost is
    * k partial mins — skew-immune by construction, measured in
    * SkewProbe `skew_funnel_hotuser`. */
  def stepsByKey(events: DataFrame, entityCol: String, typeCol: String,
      stepTypes: Seq[String], keyCol: String): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(entityCol).as("_ent"),
      col(typeCol).as("_ty"), col(keyCol).as("_k"))
    var acc = ev.filter(col("_ty") === stepTypes.head)
      .groupBy(col("_ent")).agg(min(col("_k")).as("k1"))
    stepTypes.zipWithIndex.drop(1).foreach { case (ty, i) =>
      val prev = s"k$i"; val cur = s"k${i + 1}"
      val nextMin = ev.filter(col("_ty") === ty)
        .join(acc.select(col("_ent"), col(prev)), "_ent")
        .filter(col(prev).isNotNull && col("_k") > col(prev))
        .groupBy(col("_ent")).agg(min(col("_k")).as(cur))
        .select(col("_ent").as("_e2"), col(cur))
      acc = acc.join(nextMin, col("_ent") === col("_e2"), "left")
        .drop("_e2")
    }
    val depth = stepTypes.indices.map(i => col(s"k${i + 1}").isNotNull)
      .map(c => when(c, 1L).otherwise(0L)).reduce(_ + _)
    acc.withColumn("depth", depth)
      .withColumnRenamed("_ent", entityCol)
  }
}
