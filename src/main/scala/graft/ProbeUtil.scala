package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared measurement helpers for the dev probes ([[ScaleProbe]],
  * [[SkewProbe]]) — ONE implementation of the probe measurement
  * contract, so a fix to it (e.g. the materialize-before-timing rule)
  * cannot silently diverge between probes and break cross-round
  * comparability. */
private[graft] object ProbeUtil {

  def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
  }

  /** Union `base` k× with each id column shifted by ITS OWN span —
    * key cardinality grows ×k (the realistic growth mode); a shared
    * span would leave wider columns' copies overlapping. */
  def scaled(base: DataFrame, idCols: Seq[String], n: Int): DataFrame = {
    val spans = idCols.map(c =>
      c -> (base.agg(max(col(c))).head().getLong(0) + 1)).toMap
    (0 until n).map { i =>
      idCols.foldLeft(base)((df, c) => df.withColumn(c, col(c) + i * spans(c)))
    }.reduce(_ unionByName _)
  }

  /** Edge-list ×k as disjoint ISOMORPHIC copies: src and dst live in
    * the same node-id space, so both shift by one SHARED span —
    * [[scaled]]'s per-column spans would desynchronize the endpoints
    * whenever max(src) != max(dst) (the global max id need not appear
    * on both sides), breaking the disjoint-copies premise. */
  /** The probes' shared part graph: within-order next-part edges off
    * lineitem, order tie-broken on the value (the round-16 lead()
    * lesson) — ONE implementation so every graph probe measures the
    * same edge multiset. */
  def partEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .select(col("l_partkey").cast("long").as("src"),
        lead(col("l_partkey"), 1).over(w).cast("long").as("dst"))
      .filter(col("dst").isNotNull)
  }

  def sharedSpanCopies(eBase: DataFrame, n: Int): DataFrame = {
    val span = eBase.agg(greatest(max(col("src")), max(col("dst"))))
      .head().getLong(0) + 1
    (0 until n).map { i =>
      eBase.select((col("src") + i * span).as("src"),
        (col("dst") + i * span).as("dst"))
    }.reduce(_ unionByName _)
  }

  /** Materialize to parquet and read back (untimed): the timed region
    * then runs over a plain scan — the SAME plan shape at every k. A
    * k-leg union plan grows its planning cost and scan fan-in with k,
    * which at k=100 measurably pollutes the operator's own ratio (the
    * r14 jdbc-probe lesson). */
  def mat(spark: SparkSession, df: DataFrame, tag: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-probe-$tag")
      .resolve("d.parquet").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  /** documents ×k, suffix-salted: every WORD of copy i gets a `zi`
    * suffix, so each copy is token-bijective to the original (identical
    * internal dup structure) while sharing zero tokens across copies —
    * scaling grows the corpus without inventing cross-copy duplicates. */
  def saltedDocs(docs: DataFrame, n: Int): DataFrame = {
    val span = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until n).map { i =>
      docs.withColumn("doc_id", col("doc_id") + i * span)
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1z$i"))
    }.reduce(_ unionByName _)
  }

  /** Total shuffle WRITE bytes across an action (task-end listener;
    * the 2 s sleep drains the async listener bus before reading — the
    * convention the byte-probes established). One implementation so
    * ScaleProbe/AnnCurve/SkewProbe numbers stay comparable. */
  def shuffledBytes(spark: SparkSession)(f: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { acc.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { f; Thread.sleep(2000) }
    finally spark.sparkContext.removeSparkListener(l)
    acc.get
  }

  /** Empty the block store: `clearCache()` drops catalog-cached
    * relations but NOT RDD-level persists (localCheckpoint blocks) —
    * the r15 bench lesson. Every probe rep must start from zero. */
  def sweepBlocks(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
    // drain the GraphBlocks registry too: its RDDs were just swept, but
    // the strong entries would accumulate across probe legs
    graft.ops.GraphBlocks.releaseAll()
  }
}
