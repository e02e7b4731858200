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
  val runs = sys.env.get("SPARK_GRAFT_TIMEQ_RUNS") match {
    case None => 4
    case Some(v) => v.toIntOption.map(math.max(1, _)).getOrElse {
      System.err.println(s"[timeq] SPARK_GRAFT_TIMEQ_RUNS='$v' is not an int — using 4"); 4
    }
  }
  // SPARK_GRAFT_TIMEQ_CLEAR=1 -> clearCache between runs (the Bench
  // hygiene): every run is then COLD, like the driver's measurement;
  // without it later runs reuse caches the convenience forms leak.
  val clearBetween = sys.env.get("SPARK_GRAFT_TIMEQ_CLEAR").contains("1")
  for (name <- args) {
    val ts = (0 until runs).map { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sf).write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(s"TIME $name run$i $t")
      if (clearBetween) spark.catalog.clearCache()
      t
    }
    println(f"TIME $name min ${ts.min}%.3f")
  }
  spark.stop()
}
