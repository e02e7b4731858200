package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: can nanosAsLong be set at runtime on a session built
  * without it? (Determines whether Tables can self-heal when the
  * driver's session lacks the conf.)
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
      println("PROBE: read OK without conf")
    } catch {
      case e: Exception => println(s"PROBE: fails without conf: ${e.getMessage.take(80)}")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    println(s"PROBE: after runtime set, ts type = ${schema("ts").dataType}")
    spark.stop()
  }
}
