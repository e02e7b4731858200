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

  /** Churn run: same pipeline with drops enabled. `records` counts the
    * ORIGINAL producer records, `rowsProcessed` every micro-batch input
    * row including re-ingested ones; recordsPerSec is therefore the
    * EFFECTIVE delivered throughput with the re-ingest tax paid.
    */
  final case class ChurnResult(records: Long, rowsProcessed: Long,
      reingested: Long, batches: Int, recordsPerSec: Double,
      avgBatchMs: Double, maxBatchMs: Long) {
    def reingestedFrac: Double =
      if (rowsProcessed == 0) 0.0 else reingested.toDouble / rowsProcessed
    def json: String =
      s"""{"records":$records,"rows_processed":$rowsProcessed,""" +
        s""""reingested":$reingested,""" +
        s""""reingested_frac":${"%.3f".format(reingestedFrac)},""" +
        s""""batches":$batches,""" +
        s""""records_per_sec":${"%.1f".format(recordsPerSec)},""" +
        s""""avg_batch_ms":${"%.1f".format(avgBatchMs)},"max_batch_ms":$maxBatchMs}"""
  }

  private final case class Run(batches: Int, totalSec: Double,
      avgBatchMs: Double, maxBatchMs: Long)

  /** Producer side, done once up front (not timed): envelopes -> wire
    * format, replicated `copies`x and spread over nFiles JSON-lines
    * files. Returns (records, events) counts.
    */
  private def produce(spark: SparkSession, sfDir: String, copies: Int,
      nFiles: Int, inputDir: String): (Long, Long) = {
    val envelopes = PipelineQueries.envelopes(spark, sfDir)
    val framed = FirehoseTransform.frameRecords(
      envelopes.crossJoin(spark.range(copies.toLong).select(col("id").as("_copy"))),
      concat(col("user_id"), lit("-"), col("_copy")), col("envelope"))
    framed.repartition(nFiles).write.mode("overwrite").json(inputDir)
    val nEnv = envelopes.count()
    val nEvents = envelopes.select(sum(size(col("envelope.logEvents"))))
      .head().getLong(0) * copies
    (nEnv * copies, nEvents)
  }

  /** Drive the delivery query until the source (including any re-ingest
    * self-loop traffic) is drained; report engine-measured batch stats.
    * Row counts come from the producer side, NOT numInputRows — the
    * multi-sink foreachBatch makes the engine's per-source row metric
    * an artifact of how many times the plan referenced the source
    * (r02/r03 stream entries were inflated ~2x by exactly that).
    */
  private def drive(spark: SparkSession, conf: FirehoseDelivery.Config): Run = {
    val q = FirehoseDelivery.start(spark, conf)
    try {
      q.processAllAvailable()
      val done = q.recentProgress.filter(_.numInputRows > 0)
      val durs = done.map(_.durationMs.get("triggerExecution").longValue())
      Run(done.length, durs.sum / 1000.0,
        durs.sum.toDouble / durs.length, durs.max)
    } finally q.stop()
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
    try {
      val (records, events) = produce(spark, sfDir, copies, nFiles, conf.inputDir)
      val r = drive(spark, conf)
      Result(
        records = records,
        events = events,
        batches = r.batches,
        recordsPerSec = records / r.totalSec,
        eventsPerSec = events / r.totalSec,
        avgBatchMs = r.avgBatchMs,
        maxBatchMs = r.maxBatchMs)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** Sustained run WITH the drop/re-ingest path engaged (the cost the
    * clean run excludes by raising sizeCap): the cap is sized from the
    * measured per-record transform output so each micro-batch drops
    * roughly `1 - capFrac` of its bytes, which then re-enter through
    * the self-loop as bare-string records until delivered. Progress is
    * guaranteed because every record smaller than the cap passes while
    * the running total is below it (FirehoseTransform.sizeGovernor).
    */
  def runChurn(spark: SparkSession, sfDir: String, copies: Int = 8,
      nFiles: Int = 16, filesPerTrigger: Int = 4,
      triggerMs: Long = 200L, capFrac: Double = 0.7): ChurnResult = {
    val root = Files.createTempDirectory("graft-stream-churn").toString
    val inputDir = s"$root/input"
    try {
      val (records, _) = produce(spark, sfDir, copies, nFiles, inputDir)
      // Size the cap off the actual governed quantity (len(data) +
      // len(recordId) of the TRANSFORMED record, main.py:139-140): a
      // micro-batch carries ~records/(nFiles/filesPerTrigger) records.
      val sample = FirehoseTransform.transform(
        spark.read.schema(graft.envelope.Envelope.RECORD_SCHEMA).json(inputDir))
      val avgSize = sample
        .select(avg(length(col("data")) + length(col("recordId"))))
        .head().getDouble(0)
      val perBatch = records.toDouble / (nFiles.toDouble / filesPerTrigger)
      val cap = math.max(1L, (perBatch * avgSize * capFrac).toLong)
      val conf = FirehoseDelivery.Config(
        inputDir = inputDir,
        outputDir = s"$root/output",
        checkpointDir = s"$root/checkpoint",
        triggerMs = triggerMs,
        sizeCap = cap,
        maxFilesPerTrigger = Some(filesPerTrigger))
      val r = drive(spark, conf)
      // Re-ingest traffic counted from the self-loop's own output
      // directories (reingest-batch-N under the input dir), not from
      // engine row metrics — see `drive`. A FILESYSTEM existence probe
      // decides the no-drops case: the earlier speculative read let
      // Spark stack-log an AnalysisException before the catch, and a
      // bench artifact whose tail is a stack trace reads as a crash
      // that didn't happen (VERDICT r10). Any failure of the actual
      // read still surfaces — only "no matching dirs" means zero.
      val reingestDirs = Option(new java.io.File(inputDir).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("reingest-batch-"))
      val reingested =
        if (reingestDirs.isEmpty) 0L
        else spark.read.schema(graft.envelope.Envelope.RECORD_SCHEMA)
          .json(reingestDirs.map(_.getPath): _*).count()
      ChurnResult(
        records = records,
        rowsProcessed = records + reingested,
        reingested = reingested,
        batches = r.batches,
        // effective throughput: original records delivered per second
        // of engine time, re-ingest passes included in the denominator
        recordsPerSec = records / r.totalSec,
        avgBatchMs = r.avgBatchMs,
        maxBatchMs = r.maxBatchMs)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
