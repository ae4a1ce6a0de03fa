package graft.op

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K3 `MysqlCheckOutput` (`pkg/output/mysql/check/checkoutput.go`) as join
  * algebra — the reference's data-consistency checker, and its most
  * relational operator.
  *
  * The reference buffers events per table, probes the target with PK
  * `IN`-lists (`:486-502`), diffs column-by-column (`:429-445`) and
  * classifies `row_miss` / `row_diff` (`:293-347`). Declaratively that is
  * one left join on the PK:
  *
  *   - target side null            → `row_miss`
  *   - any non-key column differs  → `row_diff`  (null-safe `<=>` compare)
  *
  * At scale this is a plain shuffled join (or broadcast if one side is a
  * sample); no IN-list batching needed — the optimizer handles the rest.
  * The reference's "recheck against live source with an update-time skew
  * window" (`:349-427`) is the same shape again: an inner join back to the
  * source filtered on `update_time < now() - skew`, dropping rows that
  * legitimately changed after the snapshot.
  */
object Checker {

  /** Second stage (`checkoutput.go:349-427`): re-probe the CURRENT
    * source for each mismatch and keep only the stable ones — a row whose
    * current version is gone or was updated at/after the cutoff changed
    * legitimately after the snapshot and is excluded as transient. */
  def recheck(mismatches: DataFrame, current: DataFrame, pkCols: Seq[String],
      updateTimeCol: String, cutoff: Column): DataFrame = {
    val cur = current.select(pkCols.map(col) :+ col(updateTimeCol).as("_upd"): _*)
    mismatches.join(cur, pkCols, "inner")
      .filter(col("_upd") < cutoff)
      .drop("_upd")
  }

  def check(source: DataFrame, target: DataFrame, pkCols: Seq[String]): DataFrame = {
    val valueCols = source.columns.filterNot(pkCols.contains)
    val t = target.select(target.columns.map(c => col(c).as(s"t_$c")): _*)
    val joinCond = pkCols.map(c => source(c) === t(s"t_$c")).reduce(_ && _)
    val anyDiff: Column = valueCols
      .map(c => !(source(c) <=> t(s"t_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    source.join(t, joinCond, "left")
      .withColumn("check_result",
        when(t(s"t_${pkCols.head}").isNull, "row_miss")
          .when(anyDiff, "row_diff")
          .otherwise("ok"))
      .filter(col("check_result") =!= "ok")
      .select(pkCols.map(source(_)) :+ col("check_result"): _*)
  }
}
