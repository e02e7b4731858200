package graft.tools

object PlanAudit extends App {
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  for (name <- args) {
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    val scans = "Scan parquet".r.findAllIn(plan).length
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    val smj = "SortMergeJoin".r.findAllIn(plan).length
    val wsc = plan.contains("*(")
    println(s"AUDIT $name scans=$scans exchanges=$exchanges bhj=$bhj smj=$smj codegen=$wsc")
  }
  spark.stop()
}
