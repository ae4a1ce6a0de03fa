package graft.streaming

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Pipeline observability — the engine's analog of the reference's
  * Prometheus `task_qps` / `task_delay` gauges (pipe-s
  * `pkg/metrics/metrics.go:16-23,86-101`, sampled per 1024 events).
  * Structured Streaming already computes per-batch rates and watermark
  * lag; this listener surfaces them as the same two numbers.
  */
final class PipelineMetrics extends StreamingQueryListener {

  final case class Snapshot(batchId: Long, inputRowsPerSecond: Double,
      processedRowsPerSecond: Double, numInputRows: Long,
      watermarkMs: Option[Long], triggerMs: Long)

  // snapshots keyed by QUERY id: listeners are session-global, so on a
  // shared session another active stream's progress would otherwise
  // overwrite the gauge between this query's termination and the read
  // (the same attribution problem StallWatchdog.restrictTo solves)
  private val last = new java.util.concurrent.ConcurrentHashMap[
    java.util.UUID, Snapshot]()
  private val anyLast = new AtomicReference[Option[Snapshot]](None)
  private val terminated =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()

  /** Most recent snapshot from ANY query this listener saw. */
  def latest: Option[Snapshot] = anyLast.get()

  /** Most recent snapshot from the given query only. */
  def latest(id: java.util.UUID): Option[Snapshot] = Option(last.get(id))

  /** Listener events are delivered ASYNCHRONOUSLY: `awaitTermination`
    * returning does not mean the final batch's progress event has
    * reached this listener — under a busy bus (a long-lived shared
    * session) the read can race ahead of delivery and see None (a
    * once-flaky spec caught exactly this). The bus is FIFO, and the
    * termination event is posted AFTER every progress event of its
    * query, so "saw the termination" ⇒ "saw all progress". */
  def sawTermination(id: java.util.UUID): Boolean = terminated.contains(id)

  /** Bounded wait for the query's termination event to be delivered —
    * call after `awaitTermination`, before reading [[latest]]. */
  def awaitDelivery(id: java.util.UUID, timeoutMs: Long = 5000L): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!sawTermination(id) && System.nanoTime() < deadline)
      Thread.sleep(10)
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    terminated.add(event.id)

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val wm = Option(p.eventTime.get("watermark"))
      .map(ts => java.time.Instant.parse(ts).toEpochMilli)
    val snap = Snapshot(
      p.batchId,
      Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      p.numInputRows,
      wm,
      p.batchDuration)
    last.put(p.id, snap)
    anyLast.set(Some(snap))
  }
}

/** Stuck-pipe watchdog — the reference's disruptor stall detector
  * (pipe-s `pkg/pipeline/simple/disruptor.go:216-236`: the input cursor
  * advanced but the ack cursor hasn't within a horizon ⇒ "pipe stuck").
  *
  * Micro-batch analog: an ACTIVE query that is neither completing
  * batches nor reporting idle. Every listener event is a heartbeat —
  * started, per-batch progress, and (crucially) idle: a source with no
  * pending data emits idle events, so "no data" never reads as a stall;
  * only a query wedged INSIDE a batch (hung sink, deadlocked stage,
  * stuck executor) goes silent. Terminated queries leave the watch set.
  *
  * Passive by design — `stalled`/`isStalled` are cheap enough to poll
  * from any scheduler thread; [[PipelineMetrics]] stays the gauge
  * surface and this is the alarm. The clock is injectable so specs can
  * drive the horizon deterministically.
  */
final class StallWatchdog(horizonMs: Long = 30000L,
    clock: () => Long = () => System.currentTimeMillis())
    extends StreamingQueryListener {

  private val beats =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]
  private val watched =
    new AtomicReference[Option[Set[java.util.UUID]]](None)

  /** Scope the alarm to specific queries. Listeners are session-global,
    * so without this a pipeline's watchdog would report OTHER pipelines'
    * long batches on a shared SparkSession; call with the started
    * query's id to watch only your own. Heartbeats are still tracked
    * for every query (restriction filters reporting, not tracking). */
  def restrictTo(ids: java.util.UUID*): Unit = watched.set(Some(ids.toSet))

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    beats.put(e.id, clock())
  override def onQueryProgress(e: QueryProgressEvent): Unit =
    beats.put(e.progress.id, clock())
  override def onQueryIdle(e: QueryIdleEvent): Unit =
    beats.put(e.id, clock())
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    beats.remove(e.id)

  /** Watched active queries whose last heartbeat is older than the horizon. */
  def stalled: Seq[java.util.UUID] = {
    val now = clock()
    import scala.jdk.CollectionConverters._
    beats.asScala.collect {
      case (id, at) if now - at > horizonMs &&
        watched.get().forall(_.contains(id)) => id
    }.toSeq
  }

  def isStalled: Boolean = stalled.nonEmpty
}
