package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 17): measure [[graft.operators.IvfStore.compactVersion]]
  * at a realistic feeder backlog — the versioned sibling of
  * [[CompactionWinProbe]]. catchUp got its 60-batch probe in round 16
  * (26.2 s -> 1.74 s); compactVersion shipped with file-ceiling specs
  * but no cost line. This probe stands up a PQ-enabled store, accretes
  * N feeder batches (the PQ-aware feeder's exact layout, written
  * directly — same files, minus the stream plumbing the e2es already
  * time), and reports:
  *
  *  - file count + compressed serving wall (3-run min of a topKPq
  *    collect) BEFORE compaction — the accreted-small-files state;
  *  - compactVersion wall at writerTasks = cores;
  *  - file count + the same serving wall AFTER, against the new
  *    version — the listing cost the compaction exists to fix;
  *  - result equivalence (served rows identical across versions) and
  *    a strandedBatchIds audit (must be empty).
  *
  * Numbers go to SCALE.md.
  */
object StoreCompactionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 60
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{IvfStore, Similarity}
    val base = java.nio.file.Files.createTempDirectory("graft-store-compact").toString
    val store = s"$base/store"

    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").persist()
    val nVecs = e.count()
    // v1: PQ-enabled bootstrap over the even half; the odd half
    // arrives as `batches` feeder batches
    IvfStore.reindex(e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      8, 2, 64, store, 1024L, pqCodes = 16, pqIters = 1)
    val ctrs = IvfStore.readCentroids(spark, store).persist()
    val cbs = IvfStore.readCodebooks(spark, store).persist()
    ctrs.count(); cbs.count()
    val tFeed0 = System.nanoTime()
    (0 until batches).foreach { b =>
      val slice = e.filter(col("vec_id") % 2 =!= 0 &&
        pmod(floor((col("vec_id") - 1) / 2).cast("long"), lit(batches)) === b)
      val assigned = Similarity.assignCells(slice, ctrs, "vec_id", "embedding")
        .select(col("_id").as("vec_id"), col("_v").as("embedding"), col("cell"))
      val coded = Similarity.pqEncode(slice, cbs, "vec_id", "embedding")
        .withColumnRenamed("_id", "vec_id")
      assigned.join(coded, "vec_id")
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"${IvfStore.dataDir(store, 1L)}/batchId=$b")
    }
    val feedS = (System.nanoTime() - tFeed0) / 1e9

    def files(v: Long): Int = {
      def walk(f: java.io.File): Int =
        if (!f.exists()) 0
        else if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(IvfStore.dataDir(store, v)))
    }
    val queries = e.filter(col("vec_id") % 499 === 0)
    def serveKey(v: Long): (Double, Set[(Long, Long, Int)]) = {
      var best = Double.MaxValue
      var rows = Set.empty[(Long, Long, Int)]
      (0 until 3).foreach { _ =>
        val t0 = System.nanoTime()
        rows = IvfStore.topKPqOf(spark, store, v, queries, "vec_id", "embedding",
            k = 5, nprobe = 3, shortlist = 20)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }
    val filesPre = files(1L)
    val dirsPre = new java.io.File(IvfStore.dataDir(store, 1L))
      .listFiles().count(_.getName.startsWith("batchId="))
    val (servePreS, rowsPre) = serveKey(1L)
    val boundary = IvfStore.maxBatchId(spark, store, 1L)
    val tc0 = System.nanoTime()
    val v2 = IvfStore.compactVersion(spark, store, writerTasks = 8,
      foldBatchesUpTo = boundary)
    val compactS = (System.nanoTime() - tc0) / 1e9
    val filesPost = files(v2)
    val dirsPost = new java.io.File(IvfStore.dataDir(store, v2))
      .listFiles().count(_.getName.startsWith("batchId="))
    val (servePostS, rowsPost) = serveKey(v2)
    val stranded = IvfStore.strandedBatchIds(spark, store, 1L, v2,
      afterBatchId = boundary)
    println(f"""PROBE {"leg":"storeCompaction","vecs":$nVecs,"batches":$batches,"feed_s":$feedS%.2f,"files_pre":$filesPre,"files_post":$filesPost,"dirs_pre":$dirsPre,"dirs_post":$dirsPost,"compact_s":$compactS%.2f,"serve_pre_s":$servePreS%.3f,"serve_post_s":$servePostS%.3f,"queries":${queries.count()},"rows_equal":${rowsPre == rowsPost},"stranded":${stranded.size}}""")
    e.unpersist(); ctrs.unpersist(); cbs.unpersist()
    spark.stop()
  }
}
