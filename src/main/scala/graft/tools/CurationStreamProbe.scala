package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measured throughput point for the round-13 streaming
  * serving feeders over the sf0.1 documents corpus —
  * [[graft.streaming.StreamingOps.curationStream]] (full disposition
  * pipeline per micro-batch, history growing as batches land) and
  * [[graft.streaming.StreamingOps.maintainIvfIndex]] (cell-assigned
  * store growth over the embeddings table).
  *
  * Shape: the corpus is sliced into `batches` single-file batches
  * (maxFilesPerTrigger=1), so later batches screen against a growing
  * accepted history — the steady-state serving cost, not the
  * empty-history best case. Output: one JSON line per leg, prefixed
  * PROBE. Numbers are recorded in SCALE.md.
  */
object CurationStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-cstream-probe").toString

    // ---- leg 1: curationStream over documents
    val docs = graft.Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val nDocs = docs.count()
    (0 until batches).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(batches)) === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$base/staging-$i")
      val part = new java.io.File(s"$base/staging-$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$base/in/b$i.parquet")
      java.nio.file.Files.createDirectories(dst.toPath.getParent)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      assert(dst.setLastModified(System.currentTimeMillis() - (batches + 2 - i) * 60000L))
    }
    // per-trigger wall times (durationMs.triggerExecution) — the
    // history-growth question (round-13 VERDICT task 6) is whether
    // LATE triggers cost more than EARLY ones as the md5/band history
    // accretes batchId dirs; a flat profile means the partition-pruned
    // equi-joins really are bounded by batch size, not history age
    val triggerMs = new java.util.concurrent.ConcurrentHashMap[Long, Long]
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val d = e.progress.durationMs.get("triggerExecution")
        if (d != null && e.progress.numInputRows > 0)
          triggerMs.put(e.progress.batchId, d.toLong)
      }
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamingOps.curationStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in"),
      "doc_id", "text", qualityMin = 0.25,
      s"$base/state", s"$base/out", s"$base/ck")
    q.awaitTermination(600000)
    val curSec = (System.nanoTime() - t0) / 1e9
    spark.streams.removeListener(listener)
    val byDisp = spark.read.parquet(s"$base/out")
      .groupBy("disposition").count().collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString(",")
    println(f"""PROBE {"leg":"curationStream","docs":$nDocs,"batches":$batches,"wall_s":$curSec%.2f,"docs_per_sec":${nDocs / curSec}%.0f,"dispositions":{$byDisp}}""")
    val ts = triggerMs.entrySet().toArray(Array.empty[java.util.Map.Entry[Long, Long]])
      .sortBy(_.getKey).map(_.getValue.toLong).toSeq
    if (ts.size >= 10) {
      def mean(s: Seq[Long]) = s.sum.toDouble / s.size
      def files(dir: String) = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(dir))
      }
      val md5Rows = spark.read.parquet(s"$base/state/md5").count()
      val bandRows = spark.read.parquet(s"$base/state/bands").count()
      println(f"""PROBE {"leg":"curationStreamPerTrigger","batches":${ts.size},"first5_mean_ms":${mean(ts.take(5))}%.0f,"last5_mean_ms":${mean(ts.takeRight(5))}%.0f,"max_ms":${ts.max},"md5_files":${files(s"$base/state/md5")},"md5_rows":$md5Rows,"band_files":${files(s"$base/state/bands")},"band_rows":$bandRows,"trigger_ms":[${ts.mkString(",")}]}""")
    }

    // ---- leg 1b: the decontamination gate's serving cost (round 14)
    // Same corpus/batching, eval split = doc_id % 97 = 0 (the q207
    // convention). gate_build_ms is the one-time pre-start cost the
    // static-eval-set contract buys (collect gram hashes + bloom);
    // per-doc throughput vs leg 1 isolates the per-trigger gate cost
    // (bloom probe in the scan + broadcast exact confirm).
    {
      val evalDocs = docs.filter(col("doc_id") % 97 === 0)
      val nEval = evalDocs.count()
      val tg0 = System.nanoTime()
      val qg = graft.streaming.StreamingOps.curationStream(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base/in"),
        "doc_id", "text", qualityMin = 0.25,
        s"$base/gstate", s"$base/gout", s"$base/gck",
        evalDocs = Some(evalDocs))
      val gateBuildMs = (System.nanoTime() - tg0) / 1e6 // collect+bloom+start
      qg.awaitTermination(600000)
      val gSec = (System.nanoTime() - tg0) / 1e9
      val gDisp = spark.read.parquet(s"$base/gout")
        .groupBy("disposition").count().collect()
        .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString(",")
      println(f"""PROBE {"leg":"curationStreamEvalGate","docs":$nDocs,"eval_docs":$nEval,"batches":$batches,"gate_build_ms":$gateBuildMs%.0f,"wall_s":$gSec%.2f,"docs_per_sec":${nDocs / gSec}%.0f,"dispositions":{$gDisp}}""")
    }

    // ---- leg 1c: the CHURNING eval-gate variant (round 15) — same
    // corpus/batching/eval split as 1b, but the gate reads the
    // version-keyed gram table per trigger instead of collecting a
    // static set before start(). publish_ms is the (out-of-stream,
    // repeatable) refresh cost a rotating benchmark pays; docs/sec vs
    // leg 1b isolates the per-trigger read+broadcast vs bloom cost.
    {
      val evalDocs = docs.filter(col("doc_id") % 97 === 0)
      val tp0 = System.nanoTime()
      val nGrams = graft.streaming.StreamingOps.publishEvalGrams(
        evalDocs, "text", s"$base/evaldir", version = 0L)
      val publishMs = (System.nanoTime() - tp0) / 1e6
      val td0 = System.nanoTime()
      val qd = graft.streaming.StreamingOps.curationStream(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base/in"),
        "doc_id", "text", qualityMin = 0.25,
        s"$base/dstate", s"$base/dout", s"$base/dck",
        evalDir = Some(s"$base/evaldir"))
      qd.awaitTermination(600000)
      val dSec = (System.nanoTime() - td0) / 1e9
      val dDisp = spark.read.parquet(s"$base/dout")
        .groupBy("disposition").count().collect()
        .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString(",")
      println(f"""PROBE {"leg":"curationStreamEvalDirGate","docs":$nDocs,"eval_grams":$nGrams,"batches":$batches,"publish_ms":$publishMs%.0f,"wall_s":$dSec%.2f,"docs_per_sec":${nDocs / dSec}%.0f,"dispositions":{$dDisp}}""")
    }

    // ---- leg 2: maintainIvfIndex over embeddings
    import graft.functions.CentroidAggregator
    val e = graft.Tables.load(spark, sfDir, "embeddings").select("vec_id", "label", "embedding")
    val nVecs = e.count()
    val centroidUdaf = udaf(new CentroidAggregator(64))
    val centroids = e.groupBy(col("label").cast("int").as("cell"))
      .agg(centroidUdaf(col("embedding")).as("ctr"))
      .persist()
    centroids.count()
    (0 until batches).foreach { i =>
      e.filter(pmod(col("vec_id"), lit(batches)) === i).select("vec_id", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/vstaging-$i")
      val part = new java.io.File(s"$base/vstaging-$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$base/vin/b$i.parquet")
      java.nio.file.Files.createDirectories(dst.toPath.getParent)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      assert(dst.setLastModified(System.currentTimeMillis() - (batches + 2 - i) * 60000L))
    }
    val t1 = System.nanoTime()
    val q2 = graft.streaming.StreamingOps.maintainIvfIndex(
      spark.readStream.schema(e.select("vec_id", "embedding").schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/vin"),
      centroids, "vec_id", "embedding", s"$base/ivf", s"$base/vck")
    q2.awaitTermination(600000)
    val ivfSec = (System.nanoTime() - t1) / 1e9
    val stored = spark.read.parquet(s"$base/ivf").count()
    println(f"""PROBE {"leg":"maintainIvfIndex","vecs":$nVecs,"stored":$stored,"batches":$batches,"wall_s":$ivfSec%.2f,"vecs_per_sec":${nVecs / ivfSec}%.0f}""")
    spark.stop()
  }
}
