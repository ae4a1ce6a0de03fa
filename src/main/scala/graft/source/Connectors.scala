package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** External connectors (S3 Kafka source / K4 Kafka sink wiring, and the
  * file-format scans the reference lacks entirely — SURVEY.md §2.4).
  *
  * The Kafka builders mirror the reference's consumer-group subscription
  * (`pkg/input/kafka/kafkainput.go`) and producer
  * (`pkg/output/kafka/kafkaoutput.go`): offsets ride in the streaming
  * checkpoint, committed after the batch's sinks succeed — the same
  * at-least-once, commit-after-durable-apply contract as the reference's
  * `MarkOffset(offset+1)`-on-ack. No broker exists in the test harness,
  * so these are exercised only at plan-construction level; the payload
  * codec (`from_json`/`to_json`) is the same P7 path that IS
  * oracle-checked.
  */
object Connectors {

  def kafkaStream(spark: SparkSession, brokers: String, topics: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topics)
      .option("startingOffsets", "earliest")
      .load()

  def kafkaBatch(spark: SparkSession, brokers: String, topics: String): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topics)
      .load()

  /** Kafka record bytes → typed change events (P7 unmarshal on `value`). */
  def decodeKafka(records: DataFrame, schema: StructType): DataFrame =
    records.select(
      col("topic"), col("partition"), col("offset"),
      from_json(col("value").cast("string"), schema).as("e"))
      .select(col("topic"), col("partition"), col("offset"), col("e.*"))

  /** File-format scans (absent from the reference; free on Spark). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
