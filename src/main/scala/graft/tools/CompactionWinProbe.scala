package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 15): measure the compaction WIN, not just its
  * semantics. Round 14's 50-trigger probe measured curationStream's
  * per-trigger wall FLAT under history growth with an honest +20%
  * tail attributed to small-file LISTING drift (399 accreted files);
  * `compactCurationHistory` answers that in-tree but no number showed
  * compaction RESETTING the drift. Two arms over the same corpus,
  * same host, same run:
  *
  *  - control: one uninterrupted N-trigger curationStream;
  *  - compacted: N/2 triggers, stop, compactCurationHistory + swap
  *    the state dirs, then the remaining N/2 triggers against the
  *    SAME checkpoint (the operator's documented between-restarts
  *    swap).
  *
  * Reported per arm: per-trigger wall means for the first/last 5
  * triggers and for the 5 triggers either side of the swap point,
  * plus state file counts (control end vs compacted end). Numbers go
  * to SCALE.md.
  */
object CompactionWinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-compact-probe").toString

    val docs = graft.Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val nDocs = docs.count()

    def stage(inDir: String, from: Int, until: Int): Unit =
      (from until until).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(batches)) === i).coalesce(1)
          .write.mode("overwrite").parquet(s"$base/staging-$i")
        val part = new java.io.File(s"$base/staging-$i").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(s"$inDir/b$i.parquet")
        java.nio.file.Files.createDirectories(dst.toPath.getParent)
        java.nio.file.Files.copy(part.toPath, dst.toPath)
        assert(dst.setLastModified(System.currentTimeMillis() - (batches + 2 - i) * 60000L))
      }

    // events are keyed by the query's runId, not a mutable arm label:
    // the listener bus is ASYNC, so an arm's last progress events can
    // arrive after awaitTermination returns and the next arm started —
    // a label read at delivery time would credit them to the wrong arm
    val runArm = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, String]
    val triggerMs = new java.util.concurrent.ConcurrentHashMap[String, java.util.Queue[Long]]
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val d = e.progress.durationMs.get("triggerExecution")
        val arm = runArm.get(e.progress.runId)
        if (d != null && arm != null && e.progress.numInputRows > 0)
          triggerMs.computeIfAbsent(arm,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]).add(d.toLong)
      }
    }
    spark.streams.addListener(listener)

    def files(dir: String): Int = {
      def walk(f: java.io.File): Int =
        if (!f.exists()) 0
        else if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(dir))
    }
    def run(tag: String, inDir: String, state: String, out: String, ck: String): Unit = {
      val q = graft.streaming.StreamingOps.curationStream(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir),
        "doc_id", "text", qualityMin = 0.25, state, out, ck)
      runArm.put(q.runId, tag)
      q.awaitTermination(1200000)
    }
    def mean(s: Seq[Long]): Double = if (s.isEmpty) -1 else s.sum.toDouble / s.size
    def stats(tag: String, swapAt: Int): String = {
      val ts = Option(triggerMs.get(tag)).fold(Seq.empty[Long])(
        _.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq)
      f""""triggers":${ts.size},"first5_ms":${mean(ts.take(5))}%.0f,""" +
        f""""pre_swap5_ms":${mean(ts.slice(swapAt - 5, swapAt))}%.0f,""" +
        f""""post_swap5_ms":${mean(ts.slice(swapAt, swapAt + 5))}%.0f,""" +
        f""""last5_ms":${mean(ts.takeRight(5))}%.0f,"trigger_ms":[${ts.mkString(",")}]"""
    }

    // ---- control arm: all N triggers, no compaction
    stage(s"$base/in-ctl", 0, batches)
    run("control", s"$base/in-ctl", s"$base/ctl-state", s"$base/ctl-out", s"$base/ctl-ck")
    Thread.sleep(2000) // drain the async listener bus before reading stats
    val ctlFiles = files(s"$base/ctl-state")
    println(s"""PROBE {"leg":"compactionControl","docs":$nDocs,${stats("control", batches / 2)},"state_files":$ctlFiles}""")

    // ---- compacted arm: N/2 triggers, compact + swap, N/2 more
    stage(s"$base/in-cmp", 0, batches / 2)
    run("compacted", s"$base/in-cmp", s"$base/cmp-state", s"$base/cmp-out", s"$base/cmp-ck")
    val preFiles = files(s"$base/cmp-state")
    val tc0 = System.nanoTime()
    val (md5N, bandN) = graft.streaming.StreamingOps.compactCurationHistory(
      spark, s"$base/cmp-state", s"$base/cmp-state2")
    val compactMs = (System.nanoTime() - tc0) / 1e6
    // the documented between-restarts swap
    val old = new java.io.File(s"$base/cmp-state")
    val aside = new java.io.File(s"$base/cmp-state-old")
    assert(old.renameTo(aside))
    assert(new java.io.File(s"$base/cmp-state2").renameTo(old))
    val postFiles = files(s"$base/cmp-state")
    stage(s"$base/in-cmp", batches / 2, batches)
    run("compacted", s"$base/in-cmp", s"$base/cmp-state", s"$base/cmp-out", s"$base/cmp-ck")
    Thread.sleep(2000) // drain the async listener bus before reading stats
    println(f"""PROBE {"leg":"compactionSwap","docs":$nDocs,${stats("compacted", batches / 2)},"files_pre_swap":$preFiles,"files_post_swap":$postFiles,"files_end":${files(s"$base/cmp-state")},"compact_ms":$compactMs%.0f,"md5_rows":$md5N,"band_rows":$bandN}""")

    // the two arms must agree on every disposition — the swap is a
    // pure layout change
    val ctl = spark.read.parquet(s"$base/ctl-out").select("doc_id", "disposition")
    val cmp = spark.read.parquet(s"$base/cmp-out").select("doc_id", "disposition")
    val diff = ctl.exceptAll(cmp).count() + cmp.exceptAll(ctl).count()
    println(s"""PROBE {"leg":"compactionEquivalence","disposition_diff":$diff}""")
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
