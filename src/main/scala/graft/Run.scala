package graft

import org.apache.spark.sql.SparkSession

/** Standalone pipeline runner — the engine's `cmd/task` analog: load a
  * JSON pipeline config and execute it.
  *
  *   sbt "runMain graft.Run examples/compact_changelog.json"
  */
object Run {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Run <config.json>")
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0))), "UTF-8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.pipeline.Pipeline.run(spark, json)
    spark.stop()
  }
}
