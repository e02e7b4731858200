package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Operational observability for the delivery pipeline (SURVEY.md A17:
  * the reference ships service/backup delivery logs to dedicated CWL
  * streams; our equivalent is a StreamingQueryListener feeding the
  * log4j stream + in-process counters that tests/ops can read).
  */
class DeliveryMetrics extends StreamingQueryListener {
  val batchesCompleted = new AtomicLong(0)
  val rowsProcessed = new AtomicLong(0)

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
    logInfo(s"delivery query started: id=${event.id} run=${event.runId}")

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    batchesCompleted.incrementAndGet()
    rowsProcessed.addAndGet(p.numInputRows)
    logInfo(s"batch=${p.batchId} rows=${p.numInputRows} " +
      s"durationMs=${p.durationMs}")
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    logInfo(s"delivery query terminated: id=${event.id} " +
      event.exception.map(e => s"exception=$e").getOrElse("clean"))

  private def logInfo(msg: String): Unit =
    org.slf4j.LoggerFactory.getLogger(classOf[DeliveryMetrics]).info(msg)
}

object DeliveryMetrics {
  /** Attach a metrics listener to the session; returns it for reading. */
  def attach(spark: SparkSession): DeliveryMetrics = {
    val m = new DeliveryMetrics
    spark.streams.addListener(m)
    m
  }
}
