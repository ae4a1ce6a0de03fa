package graft

import org.apache.spark.sql.functions._
import graft.op.{Seqs, Skew}
import graft.streaming.PipelineMetrics

/** Scale utilities: salted aggregation/join equivalence, distributed
  * sequence correctness, bucketed co-located joins, metrics listener. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("v"), count(lit(1)).as("c"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq("k"), 8)(
      Seq(sum("v").as("v"), count(lit(1)).as("c")),
      Seq(sum("v").as("v"), sum("c").as("c")))
      .as[(String, Double, Long)].collect().toSet
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val left = (1 to 5000).map(i => (if (i % 3 == 0) 1L else i.toLong % 100, i))
      .toDF("k", "lv")
    val right = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), 8).select("k", "lv", "rv")
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("globalSeq is a dense 1..n sequence respecting the order column") {
    val df = (1 to 5000).map(i => (5000 - i + 1).toLong).toDF("k")
    val seqd = Seqs.globalSeq(df, "k").select("k", "seq")
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(seqd.map(_._2).toSeq == (1L to 5000L))
    assert(seqd.map(_._1).toSeq == (1L to 5000L)) // seq follows k order
  }

  test("bucketed tables join without an exchange on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: no shuffle exchange feeds the join
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free bucketed join, got:\n$plan")
    assert(joined.count() > 0)
  }

  test("metrics listener reports qps and batch progress") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val metrics = new PipelineMetrics
    spark.streams.addListener(metrics)
    try {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      mem.addData(1L to 1000L: _*)
      val q = mem.toDS().toDF("v").groupBy().count()
        .writeStream.format("memory").queryName("m_cnt").outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
      // listener events are async; wait briefly
      val deadline = System.currentTimeMillis() + 10000
      while (metrics.latest.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val snap = metrics.latest
      assert(snap.nonEmpty && snap.get.numInputRows == 1000L)
    } finally spark.streams.removeListener(metrics)
  }
}
