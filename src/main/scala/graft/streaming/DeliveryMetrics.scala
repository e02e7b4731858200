package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Operational observability for the delivery pipeline (SURVEY.md A17:
  * the reference ships service/backup delivery logs to dedicated CWL
  * streams; our equivalent is a StreamingQueryListener feeding the
  * log4j stream + in-process counters that tests/ops can read).
  *
  * Round 11: per-batch STATE metrics ride the same listener. The
  * bounded-state claim the RocksDB soaks make (state plateaus at the
  * open horizon instead of growing with stream lifetime) is the
  * number a 100 TB deployment pages on — so it is exposed here as a
  * continuously-collected series ([[stateSnapshots]]), not a one-time
  * measurement: StatefulSpec's 24-trigger soak asserts its plateau
  * THROUGH this listener, the same path production monitoring reads.
  */
class DeliveryMetrics extends StreamingQueryListener {
  val batchesCompleted = new AtomicLong(0)
  val rowsProcessed = new AtomicLong(0)

  private val stateBuf =
    new java.util.concurrent.ConcurrentLinkedQueue[DeliveryMetrics.StateSnapshot]
  // maintained alongside stateBuf: ConcurrentLinkedQueue.size() is an
  // O(n) traversal, unaffordable per-add on the listener-bus thread
  private val stateCount = new AtomicLong(0)

  /** Per-(batch, stateful operator) snapshots in arrival order, across
    * every query this listener observed — filter by `queryId` when the
    * session runs several streams. Bounded: only the most recent
    * [[DeliveryMetrics.MAX_STATE_SNAPSHOTS]] are retained (a listener
    * on a weeks-lived 200 ms-trigger stream would otherwise grow the
    * driver heap without limit); the full history lives in the log4j
    * stream this listener also writes.
    */
  def stateSnapshots: Seq[DeliveryMetrics.StateSnapshot] =
    stateBuf.iterator().asScala.toSeq

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
    logInfo(s"delivery query started: id=${event.id} run=${event.runId}")

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    batchesCompleted.incrementAndGet()
    rowsProcessed.addAndGet(p.numInputRows)
    p.stateOperators.foreach { s =>
      // Eviction is correct under the listener bus's single-writer
      // delivery (one thread calls onQueryProgress); still, decrement
      // ONLY on a successful poll and bail out on null — resetting the
      // counter to 0 on a raced-empty read could let stateBuf exceed
      // the ceiling if a concurrent producer ever appears.
      var evicting = stateCount.get() >= DeliveryMetrics.MAX_STATE_SNAPSHOTS
      while (evicting) {
        if (stateBuf.poll() != null) {
          evicting = stateCount.decrementAndGet() >= DeliveryMetrics.MAX_STATE_SNAPSHOTS
        } else evicting = false // queue drained out from under the counter
      }
      stateCount.incrementAndGet()
      stateBuf.add(DeliveryMetrics.StateSnapshot(
        queryId = p.id,
        batchId = p.batchId,
        operator = s.operatorName,
        numRowsTotal = s.numRowsTotal,
        numRowsUpdated = s.numRowsUpdated,
        numRowsRemoved = s.numRowsRemoved,
        memoryUsedBytes = s.memoryUsedBytes))
      logInfo(s"batch=${p.batchId} stateOp=${s.operatorName} " +
        s"stateRows=${s.numRowsTotal} stateBytes=${s.memoryUsedBytes} " +
        s"removed=${s.numRowsRemoved}")
    }
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

  /** Retention cap for the in-process state-snapshot ring. */
  val MAX_STATE_SNAPSHOTS: Int = 4096

  /** One stateful operator's footprint after one micro-batch. */
  final case class StateSnapshot(
      queryId: java.util.UUID,
      batchId: Long,
      operator: String,
      numRowsTotal: Long,
      numRowsUpdated: Long,
      numRowsRemoved: Long,
      memoryUsedBytes: Long)

  /** Attach a metrics listener to the session; returns it for reading. */
  def attach(spark: SparkSession): DeliveryMetrics = {
    val m = new DeliveryMetrics
    spark.streams.addListener(m)
    m
  }

  /** Detach a listener attached with [[attach]]. */
  def detach(spark: SparkSession, m: DeliveryMetrics): Unit =
    spark.streams.removeListener(m)
}
