package graft.tools

/** Dev tool: write each named query's `.explain("formatted")` output to
  * `<outDir>/<name>_<tag>.txt` — the round-18 optimization evidence files
  * (`plans/r18/<query>_before.txt` / `..._after.txt`). Args:
  * `<outDir> <tag> [queryName...]` (no names = every declared query).
  * Conf mirrors Bench: `SPARK_GRAFT_CPUS` cores / shuffle partitions,
  * data dir from `SPARK_GRAFT_SF_DIR` (plan shape — join strategy, AQE
  * thresholds — can depend on input sizes, so dump at the bench SF).
  */
object PlanDump extends App {
  val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val outDir = args(0)
  val tag = args(1)
  new java.io.File(outDir).mkdirs()
  val names = if (args.length > 2) args.drop(2).toSeq
    else graft.SparkEntry.queries.keys.toSeq.sorted
  for (name <- names) {
    try {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"DUMPED $name")
    } catch { case e: Throwable =>
      System.err.println(s"[plandump] $name failed: ${e.getMessage}")
    }
    // composed-pipeline builders persist frames at construction;
    // drop them so later dumps see a clean session
    spark.catalog.clearCache()
  }
  spark.stop()
}
