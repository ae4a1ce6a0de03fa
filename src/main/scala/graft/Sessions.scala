package graft

import org.apache.spark.sql.SparkSession

/** ONE local-session recipe shared by every entrypoint (Run, Verify,
  * Bench, StreamBench, the probes): the bench must measure the same
  * session production runs — r21 carried
  * `canChangeCachedPlanOutputPartitioning` in Bench only, so the bench
  * timed plans Run/Verify would never produce (and the r20→r21 deltas
  * on cache-heavy queries conflated the flag with the code changes). */
object Sessions {

  /** Local session with the engine's shared config. `shufflePartitions`
    * defaults to the core count (the local-mode scale heuristic every
    * entrypoint used); pass it explicitly when a tool needs a different
    * plan shape (Explain mirrors the 32-core bench session). */
  def local(cpus: String, shufflePartitions: String = null,
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        Option(shufflePartitions).getOrElse(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // let AQE coalesce CACHED plans too (off by default): the hot ops
      // cache their operand frames (signatures, edge sets, adjacency),
      // and without this every cache materializes at the full session
      // shuffle constant instead of the input-sized partitioning AQE
      // would pick — the same §2 scale-adaptivity the uncached plans
      // already get. Values are unaffected (partitioning only).
      // SPARK_GRAFT_CACHED_REPART=0 is the A/B attribution knob: a
      // paired bench with it toggled prices this flag alone (it was a
      // bench-only config in r21, confounding the round's deltas).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        (sys.env.getOrElse("SPARK_GRAFT_CACHED_REPART", "1") != "0").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    muteCheckpointUnpersistWarn()
    s
  }

  /** The iterative ops' per-round lineage-cut discipline (Lineage.cut)
    * unpersists the PREVIOUS round's localCheckpoint every round, and
    * Spark logs a WARN ("RDD … was locally checkpointed … cannot be
    * recomputed after unpersisting") per unpersist — thousands of lines
    * per run that drowned the one real failure out of r21's `sbt test`
    * tail. The unpersist is deliberate (the frame that read those
    * blocks is gone), so the warning carries no signal here: pin the
    * rdd package's loggers to ERROR after setLogLevel (which only moves
    * the ROOT level, leaving this per-package level in place). */
  def muteCheckpointUnpersistWarn(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // logging must never fail a run
}
