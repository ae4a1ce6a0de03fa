package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: each left row picks the most recent right row
  * with `right.ts <= left.ts` within the same key (ties at equal ts
  * resolve to the right row — the `>=` contract).
  *
  * Spark has no native as-of operator; the naive formulation is a range
  * join (O(n·m) per key) or a correlated subquery. The scalable idiom
  * used here is union + ordered window:
  *
  *   1. tag right rows side=0, left rows side=1, union by name;
  *   2. ONE shuffle, partition by key, order by (ts, side, tie);
  *   3. `last(payload, ignoreNulls)` carries the latest right payload
  *      forward along the timeline;
  *   4. keep the left rows.
  *
  * Cost: one exchange + one in-partition sort — the same shape as any
  * keyed window, no pair explosion, skew handled by AQE like any other
  * shuffle. This is the canonical pattern for "join events to the state
  * that was current at event time" in training-data pipelines.
  */
object AsOfJoin {

  /** @param payload right columns to carry (exposed as `asof_<name>`);
    * @param tieCol  deterministic tie-break among right rows sharing
    *                (key, ts) — the max wins. */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payload: Seq[String], tieCol: String): DataFrame = {
    val leftCols = left.columns
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol), lit(0).as("_side"), col(tieCol).as("_tie"),
        struct(payload.map(col): _*).as("_payload")): _*)
    // `_side` dominates `_tie` in the sort, so the left-side tie value is
    // irrelevant — a typed constant keeps the union schema aligned.
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol), lit(1).as("_side"),
        lit(0).cast(r.schema("_tie").dataType).as("_tie"),
        lit(null).cast(r.schema("_payload").dataType).as("_payload")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_asof").getField(p).as(s"asof_$p")): _*)
  }
}
