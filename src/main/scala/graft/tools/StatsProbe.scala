package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: per-round optimized-plan stats bit-lengths of the
  * old vs new kCore loop shapes under eager localCheckpoint.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges = (0L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val k = 2

    // OLD shape
    var e = edges.localCheckpoint()
    for (i <- 0 until 12) {
      val deg = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("_d"))
      val keep = deg.filter(col("_d") >= k).select(col("node"))
      e = e.join(keep.select(col("node").as("a")), "a")
        .join(keep.select(col("node").as("b")), "b")
        .select(col("a"), col("b")).localCheckpoint()
      println(s"OLD round $i bits=${e.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength}")
    }

    // NEW shape
    var e2 = edges.localCheckpoint()
    var deg2 = e2.select(col("a").as("node")).union(e2.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("_d")).localCheckpoint()
    for (i <- 0 until 12) {
      val (en, dn) = graft.operators.Graph.kCoreStep(e2, deg2, k)
      e2 = graft.operators.Graph.ckptMeasured(en)
      deg2 = graft.operators.Graph.ckptMeasured(dn)
      println(s"NEW round $i ebits=${e2.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength} degbits=${deg2.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength}")
    }
    spark.stop()
  }
}
