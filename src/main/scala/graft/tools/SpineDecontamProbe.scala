package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev probe (round 18): time the REAL pretrainingRun (gate vs
  * no-gate) on the same PII-suffixed input with stage accounting.
  */
object SpineDecontamProbe extends App {
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[32]").config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.maxPlanStringLength",
      sys.env.getOrElse("PROBE_MAXPLANSTR", "2147483632"))
    .config("spark.sql.ui.explainMode",
      sys.env.getOrElse("PROBE_EXPLAINMODE", "formatted"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  import graft.operators.{CorpusOps, TextAnalysis}
  val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val docs = graft.Tables.load(spark, sf, "documents")
  val withPii = docs
    .filter(col("doc_id").isNotNull && col("text").isNotNull)
    .select(col("doc_id"), col("lang"), concat(
      col("text"), lit(" reach user"), col("doc_id").cast("string"),
      lit("@example.com or call 415-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("text"))
  val scrub83 = TextAnalysis.scrubPii(
    withPii.filter(col("doc_id") % 83 === 0), col("doc_id"), col("text"))
  val toksE = split(col("clean_text"), " ")
  val evalDocs = scrub83.select(
    (col("doc_id") + 10000000L).as("doc_id"),
    array_join(transform(
      filter(sequence(lit(1), size(toksE)), i => i % 7 =!= 4),
      i => element_at(toksE, i)), " ").as("text"))

  @volatile var stages = 0
  @volatile var taskMs = 0L
  val stageLog = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Int)]
  spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages += 1
      taskMs += sc.stageInfo.taskMetrics.executorRunTime
      val wall = (for { a <- sc.stageInfo.completionTime; b <- sc.stageInfo.submissionTime }
        yield a - b).getOrElse(-1L)
      stageLog.synchronized {
        stageLog += ((sc.stageInfo.stageId,
          sc.stageInfo.taskMetrics.executorRunTime, wall, sc.stageInfo.numTasks))
      }
    }
  })
  def t[A](label: String, top: Boolean = false)(f: => A): A = {
    val (s0, m0) = (stages, taskMs)
    stageLog.synchronized(stageLog.clear())
    val t0 = System.nanoTime()
    val r = f
    Thread.sleep(300)
    println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      s"stages=${stages - s0} taskSec=${(taskMs - m0) / 1000}")
    if (top) stageLog.synchronized {
      stageLog.sortBy(-_._3).take(8).foreach { case (id, rt, w, nt) =>
        println(f"  STAGE $id wall=${w / 1000.0}%.1f s task=${rt / 1000.0}%.1f s tasks=$nt")
      }
    }
    r
  }

  def one(label: String, ev: Option[DataFrame]): Unit = {
    val run = CorpusOps.pretrainingRun(withPii,
      minWords = 20L, maxWords = 95L, minMeanLen = 4.5, maxMeanLen = 5.6,
      stopWords = Seq("the", "a"), minStopHits = 1L, maxTop2Frac = 0.12,
      targetPred = col("lang") === "en", dim = 64, samplesPerLang = 25,
      packBudget = 512L, maxOpen = 4, evalDocs = ev,
      fuzzyTau = 0.4, fuzzyRowsPerBand = 1)
    t(s"${label}_write", top = true)(run.result.orderBy(col("doc_id"))
      .write.mode("overwrite").format("noop").save())
    val df2 = run.result.orderBy(col("doc_id"))
    val qe = df2.queryExecution
    t(s"${label}_qe_analyzed")(qe.analyzed)
    t(s"${label}_qe_cached")(qe.withCachedData)
    t(s"${label}_qe_optimized")(qe.optimizedPlan)
    t(s"${label}_qe_spark")(qe.sparkPlan)
    t(s"${label}_qe_executed")(qe.executedPlan)
    val mainThread = Thread.currentThread()
    @volatile var dumping = true
    val dumper = new Thread(() => {
      var i = 0
      while (dumping) {
        Thread.sleep(5000)
        if (dumping) {
          i += 1
          val st = mainThread.getStackTrace.take(14)
          println(s"DUMP $label#$i main: " + st.mkString(" <- "))
          Thread.getAllStackTraces.forEach { (th, tr) =>
            if (th.getName.contains("QueryStageCreator") ||
                th.getName.contains("shuffle-") && tr.nonEmpty) ()
          }
        }
      }
    })
    dumper.setDaemon(true)
    dumper.start()
    t(s"${label}_write2")(df2
      .write.mode("overwrite").format("noop").save())
    dumping = false
    run.release()
    spark.catalog.clearCache()
  }
  one("nogate", None)
  one("gate", Some(evalDocs))
  spark.stop()
}
