package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: occupancy mixes under a trained codebook — sizing data
  * for the IvfStore e2e's planted-drift contrast.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "label", "embedding")
    val low = e.filter(col("label") < 5).select("vec_id", "embedding")
    val ctrs = graft.operators.Similarity.trainKMeans(low, "vec_id", "embedding", 4, 2, 64, 1024L)
    def occ(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val m = graft.operators.Similarity.assignCells(df, ctrs, "vec_id", "embedding")
        .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      println(s"PROBE $name: $m")
    }
    occ("baseline(low)", low)
    occ("lowSlice", e.filter(col("label") < 5 && col("vec_id") % 3 === 0).select("vec_id", "embedding"))
    occ("label0", e.filter(col("label") === 0).select("vec_id", "embedding"))
    occ("high", e.filter(col("label") >= 5).select("vec_id", "embedding"))
    // per-label cell map
    val lm = graft.operators.Similarity.assignCells(e, ctrs, "vec_id", "embedding")
      .join(e.select(col("vec_id").as("_id"), col("label")), "_id")
      .groupBy("label", "cell").count().orderBy("label", "cell").collect()
    println("PROBE label->cell: " + lm.mkString(" "))
    spark.stop()
  }
}
