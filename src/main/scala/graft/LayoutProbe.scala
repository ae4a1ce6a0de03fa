package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: the DATA-SKIPPING witness for the release layouts.
  * `release_zorder` assigns a Morton bucket; the 100-TB claim is that
  * files CLUSTERED by that bucket carry bounded min/max ranges on BOTH
  * dimensions, so a scan filtered on EITHER column prunes most files
  * from parquet footer stats alone — where a single-column sort only
  * ever prunes its leading column. This probe measures that claim
  * directly from the written files' footers (engine-independent: the
  * same stats DuckDB, Trino, or Spark's parquet reader would skip on):
  *
  *   1. write the corpus three ways — single-file baseline aside: laid
  *      out by `rangeLayout(doc_id)` (the 1-D sort analog), and by
  *      `zorderLayout(doc_id, n_chars)` — one file per bucket;
  *   2. for a 1-in-8 range predicate on doc_id alone, then on n_chars
  *      alone, count the files whose footer [min, max] interval for
  *      that column intersects the predicate — everything else is
  *      skipped without being read.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.LayoutProbe"
  */
object LayoutProbe {

  /** Per-file (min, max) of a long column, straight from the parquet
    * footers (no Spark scan — this IS the skipping metadata). */
  private def fileRanges(dir: String, column: String): Seq[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    def parquetFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(parquetFiles)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    parquetFiles(new java.io.File(dir)).map { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toURI),
        new org.apache.hadoop.conf.Configuration())
      val r = ParquetFileReader.open(in)
      try {
        val stats = r.getFooter.getBlocks.asInstanceOf[java.util.List[
          org.apache.parquet.hadoop.metadata.BlockMetaData]]
        var lo = Long.MaxValue; var hi = Long.MinValue
        stats.forEach { b =>
          b.getColumns.forEach { c =>
            if (c.getPath.toDotString == column) {
              val st = c.getStatistics
              lo = math.min(lo, st.genericGetMin.asInstanceOf[Number].longValue())
              hi = math.max(hi, st.genericGetMax.asInstanceOf[Number].longValue())
            }
          }
        }
        (lo, hi)
      } finally r.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, appName = "graft-layoutprobe")
    import graft.ops.Mixing

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))

    val tmp = java.nio.file.Files.createTempDirectory("graft-layout")
    // 1-D analog: 64 contiguous doc_id ranges, one file each
    val byA = Mixing.rangeLayout(docs, "doc_id", 64)
    byA.repartition(64, col("grp")).write.partitionBy("grp")
      .mode("overwrite").parquet(s"$tmp/byA")
    // 2-D: 8×8 Morton grid over (doc_id, n_chars), one file per zbucket
    val byZ = Mixing.zorderLayout(docs, "doc_id", "n_chars", bitsPerDim = 3)
    byZ.repartition(64, col("zbucket")).write.partitionBy("zbucket")
      .mode("overwrite").parquet(s"$tmp/byZ")

    // 1-in-8 predicates in the middle of each dimension's value range
    def midEighth(c: String): (Long, Long) = {
      val r = docs.agg(min(col(c)), max(col(c))).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val w = (hi - lo + 1) / 8
      (lo + 3 * w, lo + 4 * w - 1)
    }
    val (aLo, aHi) = midEighth("doc_id")
    val (bLo, bHi) = midEighth("n_chars")

    def survivors(dir: String, column: String, lo: Long, hi: Long): (Int, Int) = {
      val ranges = fileRanges(dir, column)
      (ranges.count { case (mn, mx) => mx >= lo && mn <= hi }, ranges.size)
    }
    Seq(
      ("byA", "doc_id", aLo, aHi), ("byA", "n_chars", bLo, bHi),
      ("byZ", "doc_id", aLo, aHi), ("byZ", "n_chars", bLo, bHi)
    ).foreach { case (layout, column, lo, hi) =>
      val (live, total) = survivors(s"$tmp/$layout", column, lo, hi)
      println(s"""{"probe":"layout_skipping","layout":"$layout",""" +
        s""""filter_col":"$column","files_read":$live,"files_total":$total,""" +
        f""""pruned_frac":${1.0 - live.toDouble / total}%.3f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
