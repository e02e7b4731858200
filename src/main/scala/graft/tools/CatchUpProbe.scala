package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfStore, Similarity}

/** Dev tool: migration cost of [[graft.operators.IvfStore.catchUp]]
  * at a 60-pending-batch backlog (the "60 s cadence x 1 h retrain"
  * scenario the round-15 verdict sized) — the single-job rewrite vs
  * an emulation of the old per-batch loop (one re-assign+write job
  * plus one count job PER directory). Feeds SCALE.md.
  */
object CatchUpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val base = java.nio.file.Files.createTempDirectory("graft-catchup-probe").toString
    val e = graft.Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")

    // v1 over a snapshot; 60 feeder batchIds of arrivals under v1
    IvfStore.reindex(e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
      4, 2, 64, s"$base/store", 1024L)
    // batch key decorrelated from the %3 snapshot split (a plain
    // vec_id mod 60 would leave every b divisible by 3 EMPTY)
    val pending = e.filter(col("vec_id") % 3 =!= 0)
      .withColumn("b", pmod(floor(col("vec_id") / 3), lit(60)).cast("long"))
    val ctrs1 = IvfStore.readCentroids(spark, s"$base/store")
    val perBatch = pending.count() / 60.0
    (0L until 60L).foreach { b =>
      Similarity.assignCells(pending.filter(col("b") === b).drop("b"), ctrs1,
          "vec_id", "embedding")
        .select(col("_id").as("vec_id"), col("_v").as("embedding"), col("cell"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).partitionBy("cell")
        .parquet(s"${IvfStore.dataDir(s"$base/store", 1L)}/batchId=$b")
    }
    println(f"PROBE setup: 60 pending dirs, ~$perBatch%.0f rows each")

    // v2 retrained on the snapshot only
    IvfStore.reindex(e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
      4, 2, 64, s"$base/store", 1024L)

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // the OLD shape, emulated: per pending dir, one re-assign+write
    // job then one read-back count job (what catchUp did before r16)
    val ctrs2 = IvfStore.readCentroids(spark, s"$base/store")
    timed("per-batch loop (120 jobs) into a scratch dir") {
      (0L until 60L).map { b =>
        val rows = spark.read.parquet(s"${IvfStore.dataDir(s"$base/store", 1L)}/batchId=$b")
          .drop("cell")
        Similarity.assignCells(rows, ctrs2, "vec_id", "embedding")
          .select(col("_id").as("vec_id"), col("_v").as("embedding"), col("cell"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).partitionBy("cell")
          .parquet(s"$base/scratch/batchId=$b")
        spark.read.parquet(s"$base/scratch/batchId=$b").count()
      }.sum
    }
    val n = timed("catchUp single job (the r16 path)") {
      IvfStore.catchUp(spark, s"$base/store", 1L, 2L, afterBatchId = -1L)
    }
    println(s"PROBE migrated rows: $n")
    spark.stop()
  }
}
