package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.FirehoseTransform
import graft.queriesExt.PipelineQueries

/** Sustained-throughput measurement for the delivery pipeline — the
  * reference's core capability is a buffered delivery stream
  * (main.tf:15-19 fixes a 60 s / 5 MB cadence) but a benchmark can't
  * wait out 60 s buffers, so this drives the SAME query
  * ([[FirehoseDelivery.start]], Trigger.ProcessingTime) at a short
  * trigger over file-batched input and reports records/sec and
  * per-batch latency from the engine's own progress events.
  *
  * Input is the flagship wire format (one gzip+base64 CWL envelope per
  * user, ~100 events each, from PipelineQueries.envelopes), replicated
  * `copies`× and split across `nFiles` JSON files so
  * maxFilesPerTrigger shapes a multi-batch sustained run. sizeCap is
  * raised so the measurement is clean pipeline throughput, not
  * re-ingest churn (the drop/re-ingest path has its own e2e test in
  * StreamingSpec).
  */
object ThroughputBench {

  final case class Result(records: Long, events: Long, batches: Int,
      recordsPerSec: Double, eventsPerSec: Double,
      avgBatchMs: Double, maxBatchMs: Long) {
    def json: String =
      s"""{"records":$records,"events":$events,"batches":$batches,""" +
        s""""records_per_sec":${"%.1f".format(recordsPerSec)},""" +
        s""""events_per_sec":${"%.1f".format(eventsPerSec)},""" +
        s""""avg_batch_ms":${"%.1f".format(avgBatchMs)},"max_batch_ms":$maxBatchMs}"""
  }

  def run(spark: SparkSession, sfDir: String, copies: Int = 8,
      nFiles: Int = 16, filesPerTrigger: Int = 4,
      triggerMs: Long = 200L): Result = {
    val root = Files.createTempDirectory("graft-stream-bench").toString
    val conf = FirehoseDelivery.Config(
      inputDir = s"$root/input",
      outputDir = s"$root/output",
      checkpointDir = s"$root/checkpoint",
      triggerMs = triggerMs,
      sizeCap = 256L * 1024 * 1024, // no drops: measure clean throughput
      maxFilesPerTrigger = Some(filesPerTrigger))

    // Producer side, done once up front (not timed): envelopes -> wire
    // format, replicated and spread over nFiles JSON-lines files.
    val envelopes = PipelineQueries.envelopes(spark, sfDir)
    val framed = FirehoseTransform.frameRecords(
      envelopes.crossJoin(spark.range(copies.toLong).select(col("id").as("_copy"))),
      concat(col("user_id"), lit("-"), col("_copy")), col("envelope"))
    framed.repartition(nFiles).write.mode("overwrite").json(conf.inputDir)
    val nEvents = envelopes.select(sum(size(col("envelope.logEvents"))))
      .head().getLong(0) * copies

    val q = FirehoseDelivery.start(spark, conf)
    try {
      q.processAllAvailable()
      val done = q.recentProgress.filter(_.numInputRows > 0)
      val rows = done.map(_.numInputRows).sum
      val durs = done.map(_.durationMs.get("triggerExecution").longValue())
      val totalSec = durs.sum / 1000.0
      Result(
        records = rows,
        events = nEvents,
        batches = done.length,
        recordsPerSec = rows / totalSec,
        eventsPerSec = nEvents / totalSec,
        avgBatchMs = durs.sum.toDouble / durs.length,
        maxBatchMs = durs.max)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
