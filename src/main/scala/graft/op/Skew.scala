package graft.op

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join splitting handles most
  * cases at runtime; these are the explicit forms for the two situations
  * AQE can't fix: a single hot GROUP BY key, and a broadcast-infeasible
  * join with a known-hot key set.
  */
object Skew {

  /** Two-phase (salted) aggregation for hot grouping keys: phase 1
    * aggregates on (key, salt) — spreading one hot key over `salts`
    * reducers — phase 2 merges the partials. The caller supplies
    * re-associable partial aggregates (sums/counts/mins/maxes).
    *
    * Example: `saltedAgg(df, Seq("k"), 16)(
    *   Seq(sum("v").as("v"), count(lit(1)).as("c")),
    *   Seq(sum("v").as("v"), sum("c").as("c")))`
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*).agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side
    * that still exceeds broadcast limits: left rows get a random salt in
    * [0, salts); the right side is replicated `salts` times with every
    * salt value, and the join key becomes (key, salt). The hot key's rows
    * land on `salts` different reducers instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }
}
