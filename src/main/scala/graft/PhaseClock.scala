package graft

/** Wall-clock phase recorder for lifecycle queries (dev/bench plumbing,
  * not part of the engine surface).
  *
  * `stream_sync`-class queries spend their time in phases with very
  * different cost models — one-time slice staging, streaming-query
  * startup, per-micro-batch apply work, checkpoint/trigger overhead,
  * and the final store read. A single end-to-end number cannot
  * distinguish "the apply regressed" from "the driver machine was slow
  * to commit checkpoints" (round 10 saw a 3x driver-vs-builder swing on
  * exactly this query). [[graft.Bench]] resets the clock per rep and
  * publishes the min-rep phase split so regressions are attributable
  * from the bench artifact alone.
  *
  * Recording is a no-op-cheap merge into a concurrent map; phases are
  * recorded from whatever thread runs them (foreachBatch applies land on
  * the streaming thread).
  *
  * SINGLE-PIPELINE ASSUMPTION: the accumulator is process-global, so two
  * pipelines/streams running concurrently in one JVM would interleave
  * their phase totals under the same keys. Bench runs queries strictly
  * sequentially (reset per rep), which is the only consumer today; a
  * concurrent-pipeline harness must key its own snapshots (reset before /
  * snapshot after each pipeline, or don't trust the split).
  */
object PhaseClock {
  private val acc = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def reset(): Unit = acc.clear()

  /** Time `f`, accumulating seconds under `name` (re-entry sums). */
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally acc.merge(name, Double.box((System.nanoTime() - t0) / 1e9),
      (a, b) => Double.box(a + b))
  }

  /** Bump a counter phase (e.g. batches applied) by `n` (default 1). */
  def count(name: String, n: Long = 1L): Unit =
    acc.merge(name, Double.box(n.toDouble), (a, b) => Double.box(a + b))

  def snapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }
}
