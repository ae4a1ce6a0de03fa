package graft.source

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DSv2 micro-batch change-stream source — the engine's binlog-tail
  * extension point (SURVEY.md §2.1 S1: "full fidelity would need a
  * custom DSv2 MicroBatchStream"; this is that source, fed by the
  * harness's events table instead of a replication socket).
  *
  * Semantics mirrored from the reference's binlog input:
  *   - the log is a single totally-ordered stream; offsets are plain
  *     indexes into it (the file/pos analog), `maxRowsPerTrigger` plays
  *     the fetch batching;
  *   - the committed offset only advances after the batch's sinks
  *     succeed (Structured Streaming's commit protocol = the reference's
  *     ack-gated position persistence);
  *   - restart resumes from the checkpointed offset — replayed rows are
  *     re-delivered, downstream idempotent apply absorbs them
  *     (at-least-once).
  *
  * Ingestion is deliberately single-stream — a binlog IS one socket; the
  * parallelism boundary is the first repartition downstream, exactly as
  * the reference fans out after its single parser. The driver holds the
  * log (the harness log is small); a production source would hand
  * executors file+offset ranges instead, with the same offset algebra.
  *
  *   spark.readStream.format("graft.source.ChangelogSource")
  *     .option("dir", "/root/testdata/sf0.001")
  *     .option("maxRowsPerTrigger", "500").load()
  */
class ChangelogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangelogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChangelogTable(new CaseInsensitiveStringMap(properties).get("dir"))
}

object ChangelogSource {
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType), StructField("pk", LongType),
    StructField("tbl", StringType), StructField("op", StringType),
    StructField("r_id", LongType), StructField("r_k", IntegerType),
    StructField("r_v", DoubleType)))

  /** The ordered log, loaded once per (JVM, dir) on the driver. */
  private val logs = new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Long, String, String, Long, Int, Double)]]()

  def log(dir: String): Array[(Long, Long, String, String, Long, Int, Double)] =
    logs.computeIfAbsent(dir, d => {
      val spark = org.apache.spark.sql.SparkSession.active
      Changelog.fromEvents(spark, d)
        .selectExpr("seq", "pk", "tbl", "op", "r_id", "r_k", "r_v")
        .orderBy("seq")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
          r.getLong(4), r.getInt(5), r.getDouble(6)))
    })
}

class ChangelogTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"changelog($dir)"
  override def schema(): StructType = ChangelogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxRows = options.getInt("maxRowsPerTrigger", Int.MaxValue)
    () => new Scan {
      override def readSchema(): StructType = ChangelogSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChangelogMicroBatchStream(dir, maxRows)
    }
  }
}

case class IndexOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

class ChangelogMicroBatchStream(dir: String, maxRows: Int)
    extends MicroBatchStream with SupportsAdmissionControl {
  private lazy val total = ChangelogSource.log(dir).length.toLong

  override def initialOffset(): Offset = IndexOffset(0L)
  override def deserializeOffset(json: String): Offset = IndexOffset(json.toLong)

  // Admission control IS the rate limit: the engine commits exactly the
  // offset returned here, so the clamp must happen in latestOffset, not
  // in partition planning (clamping only there would silently skip the
  // tail of the log past each batch's cut).
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("uses admission control")
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val s = startOffset.asInstanceOf[IndexOffset].index
    IndexOffset(math.min(s + maxRows, total))
  }
  override def getDefaultReadLimit: ReadLimit =
    if (maxRows == Int.MaxValue) ReadLimit.allAvailable() else ReadLimit.maxRows(maxRows)
  override def reportLatestOffset(): Offset = IndexOffset(total)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[IndexOffset].index
    val e = end.asInstanceOf[IndexOffset].index
    Array(ChangelogRange(dir, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val ChangelogRange(d, s, e) = partition.asInstanceOf[ChangelogRange]
      new PartitionReader[InternalRow] {
        private val rows = ChangelogSource.log(d)
        private var i = s - 1
        override def next(): Boolean = { i += 1; i < e }
        override def get(): InternalRow = {
          val (seq, pk, tbl, op, rid, rk, rv) = rows(i.toInt)
          InternalRow(seq, pk, UTF8String.fromString(tbl),
            UTF8String.fromString(op), rid, rk, rv)
        }
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ChangelogRange(dir: String, start: Long, end: Long) extends InputPartition
