package graft.tools

/** Dev tool: time named SparkEntry queries at sf0.1 (warm + measured
  * run each) through the noop sink — `sbt "runMain graft.tools.TimeQ q76_percentiles"`.
  */
object TimeQ extends App {
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[8]").config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  graft.Tables.load(spark, sf, "lineitem").count() // warm the reader path
  for (name <- args; i <- 0 until 2) {
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sf).write.mode("overwrite").format("noop").save()
    println(s"TIME $name run$i ${(System.nanoTime() - t0) / 1e9}")
  }
  spark.stop()
}
