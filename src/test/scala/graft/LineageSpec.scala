package graft

import org.apache.spark.sql.functions._
import graft.ops.Lineage

/** Pins the internal-row lineage cut (r21 optimization: the iterative
  * loops' per-round checkpoint moved from df.rdd→createDataFrame —
  * two serialization passes per round — to Dataset.localCheckpoint over
  * UnsafeRows). The contract every loop leans on: the cut frame carries
  * exactly the input's rows, the count is the materialized row count,
  * and the returned RDD handle is the persisted checkpoint (so the
  * previous round can be unpersisted deterministically). */
class LineageSpec extends SparkSpec {

  test("cut preserves rows and returns the materialized count") {
    val df = spark.range(0, 1000, 1, 5)
      .select((col("id") % 97).as("k"), col("id").as("v"))
      .groupBy("k").agg(sum("v").as("s"))
    val expected = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (cut, rdd, n) = Lineage.cut(df)
    assert(n == 97)
    assert(cut.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == expected)
    assert(cut.schema == df.schema)
    // the handle is the live checkpoint backing the frame
    assert(rdd != null)
    assert(rdd.getStorageLevel.useMemory || rdd.getStorageLevel.useDisk)
    rdd.unpersist(blocking = true)
  }

  test("cutLazy materializes on the caller's first action and the cut " +
      "frame no longer re-derives its plan") {
    val acc = spark.sparkContext.longAccumulator("lineage-evals")
    val src = spark.range(0, 100, 1, 4).select(col("id"))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val counted = spark.createDataFrame(
      src.rdd.map { r => acc.add(1); Row(r.getLong(0)) },
      StructType(Seq(StructField("id", LongType))))
    val (cut, rdd) = Lineage.cutLazy(counted.groupBy().agg(sum("id").as("s")))
    assert(rdd != null)
    // first action materializes (accumulator counts one full pass) …
    assert(cut.head().getLong(0) == 4950L)
    val evalsAfterFirst = acc.value
    assert(evalsAfterFirst >= 100L)
    // … later actions read the checkpoint blocks, not the source plan
    assert(cut.head().getLong(0) == 4950L)
    assert(acc.value == evalsAfterFirst)
    rdd.unpersist(blocking = true)
  }
}
