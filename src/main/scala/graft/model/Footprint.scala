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
    * distinct — the distinction that bit in r12). A table whose footer
    * Spark cannot read at all (e.g. TIMESTAMP(NANOS) without the legacy
    * flag) records as `UNREADABLE(<error class>)` instead of crashing —
    * the guard must SHOUT about a weird fixture, never die on one. Only
    * the exception CLASS is recorded: messages embed machine-specific
    * absolute paths, which would read as perpetual false drift across
    * machines. */
  def snapshot(spark: SparkSession, sfDir: String): Map[String, String] = {
    // the legacy-nanos fixture shape is readable only under this flag
    // (normalizeTs's contract); set it for the probe and RESTORE after —
    // a read-only guard must not flip session-wide state for later code
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val tables = Option(new java.io.File(sfDir).list()).getOrElse(Array.empty)
        .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
      tables.map { t =>
        val line = try {
          spark.read.parquet(s"$sfDir/$t.parquet").schema
            .fields.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")
        } catch {
          case e: Exception => s"UNREADABLE(${e.getClass.getSimpleName})"
        }
        t -> line
      }.toMap
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Compare current footers against `path`; returns (table, recorded,
    * current) triples — empty = no drift. A missing footprint or a table
    * absent from it is a first sighting, not drift — it is RECORDED only
    * when `rebaseline` is on (pure-compare mode writes nothing, so first
    * sightings persist only once a re-baselining caller — Verify — runs).
    * A table RECORDED for this dir but gone from disk IS drift — it
    * reports as `(table, recorded, "MISSING")` (a harness that deletes or
    * renames a fixture must trip the guard as loudly as one that retypes
    * a column).
    *
    * Baseline lines are keyed `<sfDir-basename>/<table>` so runs against
    * different testdata dirs (sf0.001 / sf0.01 / sf0.1 / a custom dir)
    * each own their own section of the ONE committed file — two dirs with
    * divergent schemas no longer flap the baseline on alternating runs.
    * Legacy un-namespaced lines (`table = ...`) are still honored as a
    * fallback baseline for any dir and migrated to the namespaced form on
    * the first rebaseline.
    *
    * `rebaseline = true` rewrites THIS dir's section of `path` with the
    * current truth (other dirs' lines untouched) so the NEXT run diffs
    * against it; `false` is the pure compare (the spec's mode: a drifted
    * committed footprint keeps failing `sbt test` until the new truth is
    * deliberately re-recorded and committed, instead of self-silencing on
    * the second run). Every detected drift is also APPENDED to
    * `<path>.drift` — a persistent trace that survives the re-baseline
    * even if the one stderr banner scrolls by unread. */
  def check(spark: SparkSession, sfDir: String, path: String,
      rebaseline: Boolean = true): Seq[(String, String, String)] = {
    val base = new java.io.File(sfDir).getName
    val all: Map[String, String] =
      if (Files.exists(Paths.get(path)))
        Files.readAllLines(Paths.get(path)).asScala
          .filter(_.contains(" = ")).map { l =>
            val Array(k, v) = l.split(" = ", 2); k -> v
          }.toMap
      else Map.empty
    // this dir's baseline: namespaced keys win; bare legacy keys fall back
    val recorded: Map[String, String] = {
      val legacy = all.collect { case (k, v) if !k.contains("/") => k -> v }
      val mine = all.collect {
        case (k, v) if k.startsWith(base + "/") =>
          k.stripPrefix(base + "/") -> v
      }
      legacy ++ mine
    }
    val current = snapshot(spark, sfDir)
    val changed = current.toSeq.sorted.flatMap { case (t, cur) =>
      recorded.get(t).filter(_ != cur).map(old => (t, old, cur))
    }
    val missing = (recorded.keySet -- current.keySet).toSeq.sorted
      .map(t => (t, recorded(t), "MISSING"))
    val drifts = changed ++ missing
    if (drifts.nonEmpty) {
      val log = drifts.map { case (t, old, cur) =>
        s"${java.time.Instant.now()} $sfDir $t: [$old] -> [$cur]"
      }.mkString("", "\n", "\n")
      Files.write(Paths.get(path + ".drift"), log.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    if (rebaseline) {
      // keep OTHER dirs' namespaced lines; drop this dir's old lines and
      // all legacy bare lines (migrated to namespaced form right here)
      val kept = all.filter { case (k, _) =>
        k.contains("/") && !k.startsWith(base + "/")
      }
      val mine = current.map { case (t, v) => s"$base/$t" -> v }
      val tmp = Paths.get(path + ".tmp")
      Files.write(tmp, (kept ++ mine).toSeq.sorted
        .map { case (k, v) => s"$k = $v" }.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    }
    drifts
  }

  /** Verify-time hook: loud stderr banner per drifted table (and the
    * persistent `<path>.drift` append from [[check]]); re-baselines. */
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

  /** Anchor `TESTDATA_FOOTPRINT.txt` to the repo root regardless of the
    * launcher's working directory: walk up from user.dir to the nearest
    * dir containing build.sbt (a spark-submit from outside the repo
    * would otherwise quietly start a fresh footprint somewhere else and
    * never consult the committed baseline). */
  def defaultPath(): String = {
    var d = new java.io.File(sys.props.getOrElse("user.dir", ".")).getAbsoluteFile
    var hops = 0
    while (d != null && hops < 10 &&
        !new java.io.File(d, "build.sbt").exists()) { d = d.getParentFile; hops += 1 }
    val root = Option(d).filter(x => new java.io.File(x, "build.sbt").exists())
      .map(_.getAbsolutePath).getOrElse(sys.props.getOrElse("user.dir", "."))
    s"$root/TESTDATA_FOOTPRINT.txt"
  }
}
