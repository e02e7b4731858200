package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev smoke: runs SparkEntry.entry the way the driver does and dumps a
  * sample so the flagship pipeline can be eyeballed end-to-end.
  */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_SCHEMA=" + df.schema.simpleString)
    println("ENTRY_ROWS=" + df.count())
    val row = df.filter(col("result") === "Ok").head()
    val payload = new String(java.util.Base64.getDecoder.decode(row.getString(2)), "UTF-8")
    println("PAYLOAD_SAMPLE=" + payload.linesIterator.take(2).mkString(" | "))
    spark.stop()
  }
}
