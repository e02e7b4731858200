package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.{DeliveryMetrics, FirehoseDelivery}

/** Runnable delivery pipeline (SURVEY.md §3.2: the engine's `make
  * apply` equivalent is just wiring sources/sinks from config — no
  * infrastructure provisioning).
  *
  * Usage:
  *   runMain graft.Main <inputDir> <outputDir> <checkpointDir> \
  *     [triggerSeconds=60] [--once]
  *
  * `--once` processes everything currently available and exits
  * (Trigger.AvailableNow) — the batch-shaped smoke run; otherwise the
  * query runs on the reference's 60 s buffer cadence until killed.
  */
object Main {
  /** Tests drive main() in-process and share the SparkContext. */
  private[graft] var stopOnExit = true

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.Main <inputDir> <outputDir> <checkpointDir> [triggerSeconds] [--once]")
      sys.exit(2)
    }
    val Array(in, out, ck) = args.take(3)
    val once = args.contains("--once")
    val triggerS = args.drop(3).find(a => a.forall(_.isDigit)).map(_.toLong).getOrElse(60L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .appName("graft-delivery")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = DeliveryMetrics.attach(spark)
    val conf = FirehoseDelivery.Config(in, out, ck,
      triggerMs = triggerS * 1000, availableNow = once)
    val query = FirehoseDelivery.start(spark, conf)
    if (once) {
      query.awaitTermination()
      println(s"processed ${metrics.rowsProcessed.get()} records in " +
        s"${metrics.batchesCompleted.get()} batches")
      spark.streams.removeListener(metrics)
      if (stopOnExit) spark.stop()
    } else query.awaitTermination()
  }
}
