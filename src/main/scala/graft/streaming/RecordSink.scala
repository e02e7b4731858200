package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

/** Record-granular delivery with per-record partial-failure retry —
  * the one reference behavior (lambda/main.py:101-128) that has no
  * analogue in the file-sink path: `put_record_batch` reports an
  * ErrorCode per record, and the retry loop re-sends ONLY the failed
  * subset, bounded by maxAttempts, raising after exhaustion.
  * [[FirehoseDelivery.putRecords]] collapses this to all-or-nothing
  * because a file commit is atomic; a record-granular sink (Kafka,
  * Kinesis, an HTTP batch API) needs the real protocol, which lives
  * here.
  */
object RecordSink {

  final case class Record(recordId: String, data: String)

  /** The put_record_batch contract: deliver a batch, return one
    * error slot per input record ALIGNED BY INDEX — None = delivered,
    * Some(errorCode) = failed, retryable. Implementations must be
    * serializable (they ship to executors).
    */
  trait BatchSink extends Serializable {
    def putBatch(records: Seq[Record]): Seq[Option[String]]
  }

  /** Deliver one batch with the reference's subset-retry protocol
    * (main.py:101-128): send, collect the records whose slot carries
    * an ErrorCode, recurse on that subset only; after `maxAttempts`
    * total attempts raise with the last observed error — the same
    * terminal message shape as the reference (main.py:125-127).
    */
  def putRecordsGranular(records: Seq[Record], sink: BatchSink,
      attemptsMade: Int = 0, maxAttempts: Int = 20): Unit = {
    if (records.isEmpty) return
    val codes = sink.putBatch(records)
    require(codes.length == records.length,
      s"sink returned ${codes.length} slots for ${records.length} records")
    val failed = records.zip(codes).collect { case (r, Some(_)) => r }
    if (failed.nonEmpty) {
      val errMsg = codes.flatten.head
      if (attemptsMade + 1 < maxAttempts)
        putRecordsGranular(failed, sink, attemptsMade + 1, maxAttempts)
      else throw new RuntimeException(
        s"Could not put records after $maxAttempts attempts. $errMsg")
    }
  }

  /** Distributed delivery of (recordId, data) rows through a
    * record-granular sink: each partition streams its rows in
    * `batchSize` chunks (Firehose's put_record_batch caps at 500)
    * through the subset-retry protocol. Narrow — no shuffle, no
    * driver collect; delivery parallelism = partition count, and a
    * chunk's retries stay inside its executor.
    */
  def deliver(df: DataFrame, sink: BatchSink, batchSize: Int = 500,
      maxAttempts: Int = 20): Unit = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    df.select("recordId", "data").foreachPartition { (rows: Iterator[Row]) =>
      rows.map(r => Record(r.getString(0), r.getString(1)))
        .grouped(batchSize)
        .foreach(batch => putRecordsGranular(batch, sink, 0, maxAttempts))
    }
  }
}
