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

  /** Recursive byte size of `path` through the Hadoop FileSystem API —
    * NOT java.io.File, which only answers for the local FS: on
    * HDFS/S3 (the 100 TB deployment target) a local-File walk returns
    * 0 bytes and the whole input-sized derivation silently degrades to
    * the session constant (r21 verdict item 4). Handles bare local
    * paths, qualified URIs, and comma-separated lists; globs resolve
    * via globStatus. Unreadable/missing paths count 0 (the caller's
    * unknown-input fallback then keeps the session setting). */
  private[graft] def sizeOf(spark: SparkSession, path: String): Long =
    path.split(",").map(_.trim).filter(_.nonEmpty).map { one =>
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(one)
        val fs = p.getFileSystem(conf)
        val stats = Option(fs.globStatus(p)).getOrElse(Array.empty)
        if (stats.isEmpty) 0L
        else stats.map(s => fs.getContentSummary(s.getPath).getLength).sum
      } catch { case _: Exception => 0L }
    }.sum

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
    // override: clamp to >= 1 and ignore unparseable values (ADVICE r21:
    // a raw "0"/"-4"/"abc" here otherwise propagates into
    // spark.sql.shuffle.partitions and fails the drain obscurely)
    spark.conf.getOption("spark.graft.stream.partitions")
      .flatMap { v =>
        val n = scala.util.Try(v.trim.toInt).toOption
        if (n.isEmpty) System.err.println(
          s"[stream-tuning] ignoring unparseable spark.graft.stream.partitions='$v'")
        n.map(math.max(1, _))
      }
      .getOrElse {
        val advisory = bytesConf(spark,
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", 64L << 20)
        val bytes = paths.map(sizeOf(spark, _)).sum
        // unknown input (no paths, or nothing staged yet): keep the
        // session's own setting rather than inventing a tiny drain
        if (bytes <= 0L) cur
        else {
          val n = math.ceil(bytes.toDouble / math.max(advisory, 1L)).toLong
          math.max(1L, math.min(cur.toLong, n)).toInt
        }
      }
  }

  // one drain at a time per session: the save/set/restore below mutates
  // the session-global spark.sql.shuffle.partitions, so two overlapping
  // drains on a shared session could race the save/restore and leave the
  // session pinned at a drain value for all later batch queries (ADVICE
  // r21). Weak keys: a stopped session's entry must not outlive it.
  private val drainLocks =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Object]())
  private def lockFor(spark: SparkSession): Object =
    drainLocks.computeIfAbsent(spark, _ => new Object)

  /** Run `body` (construct + start + drain + stop of ONE bounded
    * streaming query) with `spark.sql.shuffle.partitions` sized by
    * [[drainPartitions]], restoring the session's own value afterwards
    * — the batch resolution that typically follows a drain keeps the
    * session setting (and AQE) untouched. The streaming query pins the
    * value it saw at its first batch into its checkpoint, so the
    * restore cannot re-partition a running query. Drains on the same
    * session are serialized (see [[drainLocks]]); a caller that needs
    * concurrent drains should give each its own `spark.newSession`. */
  def withDrainPartitions[T](spark: SparkSession, paths: Seq[String])
      (body: => T): T = lockFor(spark).synchronized {
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
