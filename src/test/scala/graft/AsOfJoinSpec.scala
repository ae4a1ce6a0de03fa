package graft

import org.apache.spark.sql.types._
import graft.ops.AsOfJoin
import graft.source.Connectors

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of picks latest right row at-or-before, ties -> right row counts") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 101L), (2L, 9L, 102L))
      .toDF("k", "ts", "state_id")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts",
      payload = Seq("state_id"), tieCol = "state_id")
      .select("name", "asof_state_id").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("e1").contains(100L)) // equal ts matches (>= contract)
    assert(got("e2").contains(101L)) // latest prior
    assert(got("e3").isEmpty)        // right row is after the left event
  }

  test("duplicate right timestamps resolve to max tie value") {
    val left = Seq((1L, 10L, "e")).toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L)).toDF("k", "ts", "state_id")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("state_id"), "state_id")
      .select("asof_state_id").as[Long].collect()
    assert(got.toSeq == Seq(9L))
  }

  test("csv and json connectors round-trip a frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    df.write.mode("overwrite").json(s"$dir/j")
    assert(Connectors.csv(spark, s"$dir/c", schema).orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    assert(Connectors.json(spark, s"$dir/j", schema).orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("kafka record decoding (P7 unmarshal over the record envelope)") {
    // the kafka *format* needs the connector package (deploy-time dep,
    // absent in this harness); the codec path is fully testable on the
    // record envelope shape the source produces
    val records = Seq(
      ("t", 0, 0L, """{"seq": 1, "op": "insert"}"""),
      ("t", 0, 1L, """{"seq": 2, "op": "delete"}"""))
      .toDF("topic", "partition", "offset", "value")
      .withColumn("value", $"value".cast("binary"))
    val decoded = Connectors.decodeKafka(records,
      StructType(Seq(StructField("seq", LongType), StructField("op", StringType))))
    assert(decoded.columns.toSeq == Seq("topic", "partition", "offset", "seq", "op"))
    assert(decoded.select("seq", "op").as[(Long, String)].collect().toSet ==
      Set((1L, "insert"), (2L, "delete")))
  }
}
