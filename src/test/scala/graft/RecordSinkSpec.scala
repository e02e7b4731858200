package graft

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import graft.streaming.RecordSink
import graft.streaming.RecordSink.{BatchSink, Record}

/** Per-record partial-failure retry protocol (reference
  * lambda/main.py:101-128): only the failed subset is re-sent, the
  * attempt budget is global per chunk, and exhaustion raises with the
  * reference's terminal message shape.
  */
object FlakySinkState {
  // shared JVM state (local-mode executors) for asserting sink calls
  val calls = new ConcurrentLinkedQueue[Seq[String]]
  val delivered = ConcurrentHashMap.newKeySet[String]
  val attempts = new ConcurrentHashMap[String, AtomicInteger]
  def reset(): Unit = { calls.clear(); delivered.clear(); attempts.clear() }
}

/** Fails each record id its configured number of times, then delivers. */
class FlakySink(failFirst: Map[String, Int]) extends BatchSink {
  override def putBatch(records: Seq[Record]): Seq[Option[String]] = {
    FlakySinkState.calls.add(records.map(_.recordId))
    records.map { r =>
      val n = FlakySinkState.attempts
        .computeIfAbsent(r.recordId, _ => new AtomicInteger(0))
        .getAndIncrement()
      if (n < failFirst.getOrElse(r.recordId, 0)) Some("ServiceUnavailableException")
      else { FlakySinkState.delivered.add(r.recordId); None }
    }
  }
}

class RecordSinkSpec extends SparkSpec {
  import spark.implicits._

  private def records(ids: String*): Seq[Record] = ids.map(id => Record(id, s"data-$id"))

  test("retries ONLY the failed subset (main.py:113-124)") {
    FlakySinkState.reset()
    RecordSink.putRecordsGranular(
      records("r1", "r2", "r3", "r4", "r5"),
      new FlakySink(Map("r2" -> 1, "r4" -> 1)))
    val calls = FlakySinkState.calls.asScala.toSeq
    assert(calls == Seq(Seq("r1", "r2", "r3", "r4", "r5"), Seq("r2", "r4")))
    assert(FlakySinkState.delivered.asScala == Set("r1", "r2", "r3", "r4", "r5"))
  }

  test("raises after maxAttempts with the reference's terminal message (main.py:125-127)") {
    FlakySinkState.reset()
    val e = intercept[RuntimeException] {
      RecordSink.putRecordsGranular(
        records("r1", "r2"), new FlakySink(Map("r1" -> 99)), maxAttempts = 3)
    }
    assert(e.getMessage.startsWith("Could not put records after 3 attempts."))
    assert(e.getMessage.contains("ServiceUnavailableException"))
    // 3 total attempts; r2 delivered on the first, never re-sent
    assert(FlakySinkState.calls.size == 3)
    assert(FlakySinkState.calls.asScala.toSeq.drop(1) == Seq(Seq("r1"), Seq("r1")))
    assert(FlakySinkState.delivered.asScala == Set("r2"))
  }

  test("misaligned sink response fails loudly") {
    val broken = new BatchSink {
      override def putBatch(rs: Seq[Record]): Seq[Option[String]] = Seq(None)
    }
    intercept[IllegalArgumentException] {
      RecordSink.putRecordsGranular(records("r1", "r2"), broken)
    }
  }

  test("distributed deliver: per-partition chunks, everything lands despite transient failures") {
    FlakySinkState.reset()
    val n = 1050
    val df = (1 to n).map(i => (s"r$i", s"payload-$i")).toDF("recordId", "data")
      .repartition(4)
    // every 7th record fails once, then succeeds
    val flaky = (1 to n by 7).map(i => s"r$i" -> 1).toMap
    RecordSink.deliver(df, new FlakySink(flaky), batchSize = 100)
    assert(FlakySinkState.delivered.asScala == (1 to n).map(i => s"r$i").toSet)
    // chunking respected (500-record put_record_batch cap analogue)
    assert(FlakySinkState.calls.asScala.forall(_.length <= 100))
  }
}
