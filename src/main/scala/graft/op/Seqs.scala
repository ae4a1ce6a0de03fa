package graft.op

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global sequence numbers.
  *
  * A naive `row_number() OVER (ORDER BY k)` moves the whole table to ONE
  * partition — fine at sf0.01, fatal at 100 TB. The scalable idiom is a
  * distributed range sort followed by `zipWithIndex` on the sorted RDD:
  * zipWithIndex runs one light count job over the SAME materialized
  * shuffle output (so partition numbering is consistent by construction
  * — a separate count job at the DataFrame level is not, because AQE may
  * re-plan the exchange between jobs) and then stamps offsets per
  * partition. Data moves once, through the range exchange.
  */
object Seqs {

  def globalSeq(df: DataFrame, orderCol: String, out: String = "seq",
      partitions: Int = 0): DataFrame =
    globalSeqBy(df, Seq(orderCol), out, partitions)

  /** Composite-key form (e.g. lineitem's (l_orderkey, l_linenumber)). */
  def globalSeqBy(df: DataFrame, orderCols: Seq[String], out: String = "seq",
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(p, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
