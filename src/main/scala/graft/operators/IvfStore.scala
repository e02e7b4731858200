package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned IVF store lifecycle (SURVEY.md §2 B41/B54, round 15) —
  * the RE-INDEX verb that closes the serving loop the other three
  * verbs imply: [[graft.streaming.StreamingOps.maintainIvfIndex]]
  * FEEDS a cell-partitioned store under fixed trained centroids,
  * [[graft.streaming.StreamingOps.ivfDriftStream]] ALARMS when the
  * arriving occupancy mix drifts from the index-time baseline, and
  * [[graft.streaming.StreamingOps.compactIvfIndex]] keeps the file
  * count bounded — but when the alarm fires, moving to NEW centroids
  * was previously a hand-composed retrain + rewrite + reader cutover.
  * [[reindex]] does the three safely.
  *
  * Layout under one `storeDir`:
  * {{{
  *   storeDir/v=N/data/batchId=M/cell=K/part-….parquet   // the inverted file
  *   storeDir/v=N/centroids/part-….parquet               // the codebook that built it
  *   storeDir/versions/v-N                               // empty marker = N is publishable
  * }}}
  *
  * Atomic cutover, from first principles of what object stores give
  * us: a version's data and codebook are written COMPLETELY first,
  * then a zero-byte marker `versions/v-N` is CREATED (file creation
  * is the one atomic publish primitive that needs no rename-overwrite
  * semantics — HDFS rename won't clobber, S3 has no rename at all).
  * Readers resolve "live" as the max marker ONCE per call and then
  * touch only that version's directory; a reader that resolved v=N
  * keeps reading v=N intact no matter what a concurrent reindex
  * publishes (new versions only ADD directories), so every reader
  * sees old or new, never a mix. A half-written version has no marker
  * and is invisible.
  *
  * The re-assigned corpus lands under the reserved `batchId=-1`
  * bootstrap partition: feeder batchIds are >= 0, so a
  * `maintainIvfIndex` resumed against the new version's data dir —
  * fresh checkpoint or continued — keeps its replay discipline
  * (batchId-keyed overwrites) without ever colliding with the
  * re-indexed bulk.
  *
  * 100 TB shape: [[reindex]] costs `iters + 1` corpus scans (each
  * Lloyd round is one scan + a map-side-combined (cell, sum, count)
  * aggregation — [[Similarity.trainKMeans]]) plus one partitioned
  * rewrite whose only movement is the writerTasks hash shuffle; the
  * corpus is never joined or collected. Centroid tables are k rows
  * throughout. Old versions stay on disk for in-flight readers —
  * [[dropVersionsBelow]] prunes them once their readers drain.
  */
object IvfStore {

  /** Reserved bootstrap partition for re-indexed bulk — below every
    * feeder batchId, so stream replay can never overwrite it.
    */
  val BootstrapBatchId: Long = -1L

  def dataDir(storeDir: String, version: Long): String =
    s"$storeDir/v=$version/data"

  def centroidsDir(storeDir: String, version: Long): String =
    s"$storeDir/v=$version/centroids"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The live version: the highest published marker, or None on a
    * store nothing has been published into yet. Resolution reads one
    * small directory listing — resolve once per query/stream, then
    * bind to that version's directories.
    */
  def liveVersion(spark: SparkSession, storeDir: String): Option[Long] = {
    val dir = new Path(s"$storeDir/versions")
    val fs = fsOf(spark, storeDir)
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("v-"))
        .flatMap(n => n.stripPrefix("v-").toLongOption)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Publish `version`: create its marker, making it the live version
    * iff it is the highest. Refuses to publish a version whose data or
    * centroids directory is missing — a marker must never point at a
    * half-written version (that would break the old-or-new reader
    * contract). Idempotent: re-publishing an already-marked version is
    * a no-op, so a crashed-and-retried reindex converges.
    */
  def publish(spark: SparkSession, storeDir: String, version: Long): Unit = {
    val fs = fsOf(spark, storeDir)
    Seq(dataDir(storeDir, version) -> "data",
        centroidsDir(storeDir, version) -> "centroids").foreach {
      case (d, what) => require(fs.exists(new Path(d)),
        s"publish($version): $what directory $d does not exist — " +
          "write the version completely before publishing its marker")
    }
    val marker = new Path(s"$storeDir/versions/v-$version")
    fs.mkdirs(marker.getParent)
    if (!fs.exists(marker)) fs.create(marker, false).close()
  }

  /** Write `load` cell-assigned under `centroids` as version
    * `version` and publish it — the shared tail of [[reindex]], also
    * usable directly to stand up v=1 from an externally trained
    * codebook. Data lands partitioned by cell under the reserved
    * bootstrap batchId; the codebook is stored beside it so readers
    * and feeders always probe with exactly the centroids that built
    * the version. Returns the row count written.
    */
  def bootstrap(load: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, storeDir: String, version: Long): Long = {
    val spark = load.sparkSession
    centroids
      .select(col("cell").cast("int").as("cell"),
        col("ctr").cast("array<double>").as("ctr"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(centroidsDir(storeDir, version))
    val stored = centroidsOf(spark, storeDir, version)
    Similarity.assignCells(load, stored, idCol, vecCol)
      .select(col("_id").as(idCol), col("_v").as(vecCol), col("cell"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(s"${dataDir(storeDir, version)}/batchId=$BootstrapBatchId")
    publish(spark, storeDir, version)
    spark.read.parquet(dataDir(storeDir, version)).count()
  }

  /** THE RE-INDEX VERB: retrain k-means on `load` (the corpus the
    * store should now serve — typically the live version's corpus, or
    * it plus the drifted arrivals that fired the
    * [[graft.streaming.StreamingOps.ivfDriftStream]] alarm), rewrite
    * the store under the new codebook as version live+1, and cut
    * readers over atomically via the marker. Returns the new version
    * number.
    *
    * `gridUnits` is [[Similarity.trainKMeans]]'s reproducibility
    * snap; pass the same value the original training used so
    * re-indexing is a pure function of the data. After the cutover,
    * resume the feeder against `dataDir(storeDir, newVersion)` and
    * restart the drift monitor with `centroidsOf`/the re-indexed
    * corpus as its new baseline.
    */
  def reindex(load: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, dim: Int, storeDir: String, gridUnits: Long = 0L): Long = {
    val spark = load.sparkSession
    val next = liveVersion(spark, storeDir).map(_ + 1L).getOrElse(1L)
    // single-writer guard: two concurrent reindexes would both resolve
    // `next` and Overwrite the same v=N directories, publishing a
    // BLEND of two writers' centroids and data (round-15 self-review).
    // An exclusive claim-file create — the same atomic primitive the
    // publish marker uses — makes the second writer fail fast instead.
    // A claim with no marker after a crash is manual-remove territory:
    // the error names the file, and deleting it is safe exactly
    // because an unpublished version is invisible to readers.
    val claim = new Path(s"$storeDir/claims/v-$next")
    val fs = fsOf(spark, storeDir)
    fs.mkdirs(claim.getParent)
    try fs.create(claim, false).close()
    catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"version $next is already claimed by another reindex ($claim exists) — " +
          "if that writer crashed before publishing, delete the claim file and retry", e)
    }
    val trained = Similarity.trainKMeans(load, idCol, vecCol, k, iters, dim, gridUnits)
    bootstrap(load, trained, idCol, vecCol, storeDir, next)
    fs.delete(claim, false) // published: the claim has done its job
    next
  }

  /** Close the feed gap a reindex leaves (round 15): while
    * [[reindex]] retrains, the feeder can KEEP writing to the old
    * version — pick a boundary batchId N, reindex over
    * `spark.read.parquet(dataDir(old)).filter(col("batchId") <= N)`,
    * and then migrate the arrivals the snapshot missed: every
    * `batchId > afterBatchId` directory of `fromVersion` is
    * re-assigned under `toVersion`'s STORED codebook and written into
    * `toVersion` under its ORIGINAL batchId (overwrite — the feeder's
    * own replay discipline, so re-running a crashed catch-up
    * converges). Ingestion pauses only for this migration (bounded by
    * the retrain window's arrivals), not for the retrain itself.
    * Resume the feeder against the new version with its CONTINUED
    * checkpoint — its next batchIds are beyond the migrated ones by
    * construction; a FRESH checkpoint would restart at batchId 0 and
    * overwrite a migrated directory.
    *
    * The boundary is EXPLICIT (`afterBatchId` = the N the snapshot
    * included) rather than inferred from directory listings: a racy
    * "whatever is in old but not new" rule would double-count batches
    * the snapshot already folded into the bootstrap partition.
    * Returns the number of rows migrated.
    */
  def catchUp(spark: SparkSession, storeDir: String, fromVersion: Long,
      toVersion: Long, afterBatchId: Long): Long = {
    require(afterBatchId >= BootstrapBatchId,
      s"afterBatchId must be >= $BootstrapBatchId, got $afterBatchId")
    val from = new Path(dataDir(storeDir, fromVersion))
    val fs = fsOf(spark, storeDir)
    require(fs.exists(from), s"no data under version $fromVersion at $from")
    val ctrs = centroidsOf(spark, storeDir, toVersion)
    val pending = fs.listStatus(from).map(_.getPath.getName)
      .filter(_.startsWith("batchId="))
      .flatMap(n => n.stripPrefix("batchId=").toLongOption)
      .filter(_ > afterBatchId).sorted
    pending.map { b =>
      val rows = spark.read.parquet(s"${dataDir(storeDir, fromVersion)}/batchId=$b")
        .drop("cell") // re-assign under the NEW codebook
      val cols = rows.columns.filterNot(_ == "cell")
      require(cols.length == 2,
        s"batchId=$b carries unexpected columns ${cols.mkString(",")} — expected (id, vec)")
      val (idCol, vecCol) =
        if (rows.schema(cols(0)).dataType.typeName == "array") (cols(1), cols(0))
        else (cols(0), cols(1))
      Similarity.assignCells(rows, ctrs, idCol, vecCol)
        .select(col("_id").as(idCol), col("_v").as(vecCol), col("cell"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("cell")
        .parquet(s"${dataDir(storeDir, toVersion)}/batchId=$b")
      spark.read.parquet(s"${dataDir(storeDir, toVersion)}/batchId=$b").count()
    }.sum
  }

  /** The live version's inverted file (carries `cell` and `batchId`
    * partition columns). Binds to the version that is live AT CALL
    * TIME — the old-or-new contract.
    */
  def readCorpus(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(dataDir(storeDir, requireLive(spark, storeDir)))

  /** The live version's codebook (cell: Int, ctr: Array[Double]). */
  def readCentroids(spark: SparkSession, storeDir: String): DataFrame =
    centroidsOf(spark, storeDir, requireLive(spark, storeDir))

  def centroidsOf(spark: SparkSession, storeDir: String, version: Long): DataFrame =
    spark.read.parquet(centroidsDir(storeDir, version))

  private def requireLive(spark: SparkSession, storeDir: String): Long =
    liveVersion(spark, storeDir).getOrElse(
      throw new IllegalStateException(
        s"no published version under $storeDir — bootstrap or reindex first"))

  /** Serve top-k from the live store: resolve the version ONCE, rank
    * the probed cells per query against the version's own codebook
    * (the [[Similarity.ivfTopK]] query-side shape — its shuffle is
    * bounded by |queries| x k cells), then COLLECT the probed cell
    * set (<= |queries| x nprobe ints, small by the same contract) and
    * read the inverted file through a literal `cell IN (...)` filter —
    * the collected set is what turns the probe into parquet
    * PartitionFilters, so the scan touches only probed cells' files
    * across every batchId directory. Exact cosine + per-query top-k
    * over the candidates, identical ranking math to ivfTopK.
    */
  def topK(spark: SparkSession, storeDir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = requireLive(spark, storeDir)
    val centroids = centroidsOf(spark, storeDir, v)
    val cellW = Window.partitionBy(col("query_id")).orderBy(col("_d"), col("cell"))
    val queryCells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("_d", Similarity.q6(Similarity.l2sq(col("_qv"), col("ctr"))))
      .withColumn("_rn", row_number().over(cellW))
      .filter(col("_rn") <= nprobe)
      .select(col("query_id"), col("_qv"), col("cell"))
    // the probe set is collected from its own pass over the query-side
    // plan (small by contract — the same bounded-gather rationale as
    // the centroid collect), so the returned frame stays LAZY and the
    // scan filter is a literal IN the parquet source can partition-prune
    val probed = queryCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val corpusCells = spark.read.parquet(dataDir(storeDir, v))
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("neighbor_id"))
    queryCells.join(corpusCells, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_cos", Similarity.cosine(col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        Similarity.q6(col("_cos")).as("cos_sim"))
  }

  /** Prune versions strictly below `keepFrom` (their markers AND
    * their directories) — run once in-flight readers of the old
    * version have drained. Refuses a `keepFrom` above the live
    * version: that off-by-one (`live + 1` read as "drop below the
    * next one") would delete EVERY version including the live one
    * and leave resolution undefined — the guard makes the docstring's
    * invariant real (round-15 self-review).
    */
  def dropVersionsBelow(spark: SparkSession, storeDir: String,
      keepFrom: Long): Unit = {
    val fs = fsOf(spark, storeDir)
    val dir = new Path(s"$storeDir/versions")
    if (!fs.exists(dir)) return
    val live = liveVersion(spark, storeDir)
    require(live.exists(_ >= keepFrom),
      s"dropVersionsBelow(keepFrom=$keepFrom) would delete the live version " +
        s"(${live.fold("none")(_.toString)}) — pass keepFrom <= liveVersion")
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("v-"))
      .flatMap(n => n.stripPrefix("v-").toLongOption)
      .filter(_ < keepFrom)
      .foreach { v =>
        fs.delete(new Path(s"$storeDir/v=$v"), true)
        fs.delete(new Path(s"$storeDir/versions/v-$v"), false)
      }
  }
}
