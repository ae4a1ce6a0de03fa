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

  private val last = new AtomicReference[Option[Snapshot]](None)

  def latest: Option[Snapshot] = last.get()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val wm = Option(p.eventTime.get("watermark"))
      .map(ts => java.time.Instant.parse(ts).toEpochMilli)
    last.set(Some(Snapshot(
      p.batchId,
      Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      p.numInputRows,
      wm,
      p.batchDuration)))
  }
}
