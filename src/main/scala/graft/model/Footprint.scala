package graft.model

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Cross-round schema footprint for the harness testdata tables.
  *
  * [[SchemaRegistry.detectDrift]] covers tables the ENGINE owns within a
  * run; this guard covers the tables a round STARTS with. The r12
  * regression (harness regenerated `events.parquet` with a different
  * physical `ts` type; the breakage surfaced two rounds later) is exactly
  * the failure mode: input drift between rounds, invisible because
  * nothing recorded what the previous round saw. Here every [[graft.Verify]]
  * run compares each table's footer against the committed footprint file
  * and shouts (stderr, unmissable in the driver log) on any name/type
  * change — then re-records, so the NEXT run diffs against the new truth.
  */
object Footprint {

  /** One line per table: `name = col:TYPE,col:TYPE,...` (field order as
    * in the footer; `DataType.sql` keeps TIMESTAMP vs TIMESTAMP_NTZ
    * distinct — the distinction that bit in r12). */
  def snapshot(spark: SparkSession, sfDir: String): Map[String, String] = {
    val tables = Option(new java.io.File(sfDir).list()).getOrElse(Array.empty)
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
    tables.map { t =>
      val schema = spark.read.parquet(s"$sfDir/$t.parquet").schema
      t -> schema.fields.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")
    }.toMap
  }

  /** Compare current footers against `path`; returns (table, recorded,
    * current) triples — empty = no drift. A missing footprint or a table
    * absent from it records without flagging (first sighting, not drift).
    * Always rewrites `path` with the current truth. */
  def check(spark: SparkSession, sfDir: String, path: String): Seq[(String, String, String)] = {
    val recorded: Map[String, String] =
      if (Files.exists(Paths.get(path)))
        Files.readAllLines(Paths.get(path)).asScala
          .filter(_.contains(" = ")).map { l =>
            val Array(k, v) = l.split(" = ", 2); k -> v
          }.toMap
      else Map.empty
    val current = snapshot(spark, sfDir)
    val drifts = current.toSeq.sorted.flatMap { case (t, cur) =>
      recorded.get(t).filter(_ != cur).map(old => (t, old, cur))
    }
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, current.toSeq.sorted
      .map { case (k, v) => s"$k = $v" }.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    drifts
  }

  /** Verify-time hook: loud stderr banner per drifted table. */
  def warnOnDrift(spark: SparkSession, sfDir: String, path: String): Unit =
    check(spark, sfDir, path).foreach { case (t, old, cur) =>
      System.err.println(
        s"""|[footprint] ################ SCHEMA DRIFT ################
            |[footprint] table $t changed since the recorded footprint:
            |[footprint]   recorded: $old
            |[footprint]   current : $cur
            |[footprint] fixture readers may now be wrong — see FixtureSmokeSpec
            |[footprint] ##############################################""".stripMargin)
    }
}
