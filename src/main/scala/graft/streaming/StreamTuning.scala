package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle/state partitioning for bounded micro-batch
  * drains.
  *
  * AQE coalesces post-shuffle partitions for BATCH plans, but a
  * stateful streaming operator (flatMapGroupsWithState, streaming
  * dedup/agg) gets no AQE: its state-store partition count is fixed at
  * the query's first batch from `spark.sql.shuffle.partitions` and
  * persisted in the checkpoint for the query's lifetime. Inheriting
  * the session constant means every micro-batch pays one task + one
  * state-store load/commit per configured partition REGARDLESS of how
  * much data the drain carries — a constant tuned for neither local
  * mode nor the cluster (optimization guide §2: derive partitioning
  * from input size instead).
  *
  * [[drainPartitions]] sizes the drain from the staged input bytes at
  * the advisory partition size (`spark.sql.adaptive.
  * advisoryPartitionSizeInBytes`, default 64 MB), clamped to
  * [1, session shuffle partitions]: it never RAISES parallelism above
  * the session's configured ceiling (a deployment sizes that for its
  * cluster), it only refuses to spread a small drain across hundreds
  * of near-empty state stores. `spark.graft.stream.partitions`
  * overrides the derivation outright (a deployment whose key
  * cardinality, not input bytes, drives state sizing sets this).
  */
object StreamTuning {

  private def sizeOf(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    val f = new java.io.File(path)
    if (f.exists()) walk(f) else 0L
  }

  private def bytesConf(spark: SparkSession, key: String,
      dflt: Long): Long =
    spark.conf.getOption(key).map { v =>
      val t = v.trim.toLowerCase
      def num(s: String) = s.trim.toDouble
      if (t.endsWith("g") || t.endsWith("gb"))
        (num(t.stripSuffix("gb").stripSuffix("g")) * (1L << 30)).toLong
      else if (t.endsWith("m") || t.endsWith("mb"))
        (num(t.stripSuffix("mb").stripSuffix("m")) * (1L << 20)).toLong
      else if (t.endsWith("k") || t.endsWith("kb"))
        (num(t.stripSuffix("kb").stripSuffix("k")) * (1L << 10)).toLong
      else if (t.endsWith("b")) num(t.stripSuffix("b")).toLong
      else num(t).toLong
    }.getOrElse(dflt)

  /** Partition count for a drain over the staged input at `paths`
    * (files or directories, summed): ceil(bytes / advisory), clamped
    * to [1, spark.sql.shuffle.partitions]. */
  def drainPartitions(spark: SparkSession, paths: Seq[String]): Int = {
    val cur = spark.conf.getOption("spark.sql.shuffle.partitions")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(200)
    spark.conf.getOption("spark.graft.stream.partitions")
      .map(_.toInt)
      .getOrElse {
        val advisory = bytesConf(spark,
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", 64L << 20)
        val bytes = paths.map(sizeOf).sum
        // unknown input (no paths, or nothing staged yet): keep the
        // session's own setting rather than inventing a tiny drain
        if (bytes <= 0L) cur
        else {
          val n = math.ceil(bytes.toDouble / math.max(advisory, 1L)).toLong
          math.max(1L, math.min(cur.toLong, n)).toInt
        }
      }
  }

  /** Run `body` (construct + start + drain + stop of ONE bounded
    * streaming query) with `spark.sql.shuffle.partitions` sized by
    * [[drainPartitions]], restoring the session's own value afterwards
    * — the batch resolution that typically follows a drain keeps the
    * session setting (and AQE) untouched. The streaming query pins the
    * value it saw at its first batch into its checkpoint, so the
    * restore cannot re-partition a running query. */
  def withDrainPartitions[T](spark: SparkSession, paths: Seq[String])
      (body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      drainPartitions(spark, paths).toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
      case None => spark.conf.unset("spark.sql.shuffle.partitions")
    }
  }
}
