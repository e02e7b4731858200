package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measured scale points for the iterative graph loops
  * (VERDICT r12 task 4) — the q177 treatment applied to Graph.
  *
  * Modes (args; default all): `pagerank`, `cc`, `kcore`.
  * For pagerank/cc: runs at 1x and 10x synthetic edge inflation on an
  * sf0.1-shaped graph and reports wall time, total shuffle-write
  * bytes, and (pagerank) the per-round LAZY-checkpoint stats
  * bit-length — the quantity Graph.ckptEager's scaladoc claims grows
  * LINEARLY for single-chain loops (vs ~3x/round for self-multiplying
  * shapes). For kcore: wall time of a 30-round peel on a ~180k-edge
  * graph plus the 30-iteration PropertySpec shape, for before/after
  * comparison of the incremental-degree rewrite.
  *
  * Output: one JSON line per measurement, prefixed PROBE. Numbers are
  * recorded in SCALE.md ("graph loops at 10x").
  */
object GraphScaleProbe {

  /** Sum of shuffle bytes/records written by stages completing between
    * reset() and read — the per-run shuffle cost, driver-side.
    */
  private final class ShuffleMeter extends SparkListener {
    private val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    private val records = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    def reset(): Unit = { bytes.set(0L); records.set(0L) }
    def readBytes: Long = bytes.get()
    def readRecords: Long = records.get()
  }

  private def force(df: DataFrame): Long = df.count()

  /** Synthetic sf0.1-shaped link graph: ~nNodes nodes, `factor`
    * hash-mixed edge families over the documents ids (each family
    * contributes ~|docs| edges). factor 10 = the 10x inflation point.
    */
  private def edgesAt(spark: SparkSession, dir: String, nNodes: Int,
      factor: Int): DataFrame = {
    val d = graft.Tables.load(spark, dir, "documents").select(col("doc_id"))
    (0 until factor).map { c =>
      d.select((col("doc_id") % nNodes).as("src"),
        ((col("doc_id") * (13 + 2 * c) + 7 + 1009 * c) % nNodes).as("dst"))
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val modes = if (args.isEmpty) Set("pagerank", "cc", "kcore", "hub") else args.toSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    import graft.operators.Graph

    force(graft.Tables.load(spark, dir, "documents")) // warm reader path

    if (modes("pagerank") || modes("cc")) {
      // warm the loop code paths so factor-1 is not charged for JIT
      // (unwarmed, factor 1 measures SLOWER than factor 10)
      force(Graph.pageRank(edgesAt(spark, dir, 500, 1), "src", "dst", 2))
      force(graft.operators.Dedup.connectedComponents(
        edgesAt(spark, dir, 500, 1).select(col("src").as("id1"), col("dst").as("id2"))))
    }

    if (modes("pagerank")) for (factor <- Seq(1, 10)) {
      val edges = edgesAt(spark, dir, 20000, factor)
      val nEdges = force(edges.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst")).distinct())
      meter.reset()
      val t0 = System.nanoTime()
      val pr = Graph.pageRank(edges, "src", "dst", iters = 5)
      val n = force(pr)
      val wall = (System.nanoTime() - t0) / 1e9
      // per-round stats bit-length of the LAZY cadence: replicate the
      // loop through the same prStep seam GraphSpec pins, capturing
      // the optimized-plan size estimate each round (the ckptEager
      // safety constraint's measured quantity)
      val e = edges.select(col("src").as("_src"), col("dst").as("_dst"))
        .filter(col("_src") =!= col("_dst")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("_src").as("node"))
        .union(e.select(col("_dst").as("node"))).distinct()
      val nRow = nodes.agg(count(lit(1)).as("_n"))
      val outdeg = e.groupBy(col("_src")).agg(count(lit(1)).as("_outdeg"))
      val ej = e.join(outdeg, "_src").repartition(col("_src")).persist()
      val nodesT = nodes.crossJoin(broadcast(nRow))
        .select(col("node"),
          graft.functions.intmath.ldiv(lit(Graph.RANK_SCALE * 15L / 100L), col("_n")).as("_tele"),
          graft.functions.intmath.ldiv(lit(Graph.RANK_SCALE), col("_n")).as("_init"))
        .repartition(col("node")).persist()
      var ranks = nodesT.select(col("node"), col("_init").as("rank_u"))
      val bits = (0 until 5).map { i =>
        ranks = Graph.prStep(ej, nodesT, ranks)
          .localCheckpoint(eager = Graph.ckptEager(i, 5))
        ranks.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      }
      e.unpersist(); ej.unpersist(); nodesT.unpersist()
      println(s"""PROBE {"probe":"pagerank","factor":$factor,"edges":$nEdges,"nodes":$n,"iters":5,"wall_sec":${f"$wall%.2f"},"shuffle_mb":${meter.readBytes / (1 << 20)},"shuffle_records":${meter.readRecords},"lazy_stats_bits_per_round":[${bits.mkString(",")}]}""")
    }

    if (modes("cc")) for (factor <- Seq(1, 10)) {
      val pairs = edgesAt(spark, dir, 20000, factor)
        .select(col("src").as("id1"), col("dst").as("id2"))
      meter.reset()
      val t0 = System.nanoTime()
      val cc = graft.operators.Dedup.connectedComponents(pairs)
      val n = force(cc)
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"""PROBE {"probe":"cc","factor":$factor,"rows":$n,"wall_sec":${f"$wall%.2f"},"shuffle_mb":${meter.readBytes / (1 << 20)},"shuffle_records":${meter.readRecords}}""")
    }

    if (modes("hub")) {
      // out-degree hub: node 0 -> 1..hubDeg plus a background ring, so
      // one _src partition holds hubDeg edges. The srcSalt SELECTION
      // RULE (round-13 VERDICT task 7) needs the full trade curve, not
      // one point: salt spreads the hub across `salt` partitions but
      // replicates the ranks side salt x per round (an extra exchange
      // of |V| x salt long-pairs). Sweep salt over two hub degrees and
      // record wall + shuffle so SCALE.md can state when the
      // replication cost exceeds the hub-split win. rank_sum pins
      // bit-identity across every (deg, salt) cell.
      for (n <- Seq(25000L, 100000L)) {
        val hub = spark.range(1, n + 1).select(lit(0L).as("src"), col("id").as("dst"))
        val ring = spark.range(1, n + 1).select(col("id").as("src"),
          (col("id") % n + 1).as("dst"))
        val edges = hub.union(ring)
        // warm this graph's code paths so salt=1 is not charged for JIT
        force(Graph.pageRank(edges, "src", "dst", iters = 1))
        for (salt <- Seq(1, 2, 4, 8, 16)) {
          meter.reset()
          val t0 = System.nanoTime()
          val pr = Graph.pageRank(edges, "src", "dst", iters = 3, srcSalt = salt)
          val sum = pr.agg(org.apache.spark.sql.functions.sum(col("rank_u")))
            .head().getLong(0)
          val wall = (System.nanoTime() - t0) / 1e9
          println(s"""PROBE {"probe":"hub","hub_degree":$n,"salt":$salt,"edges":${2 * n},"wall_sec":${f"$wall%.2f"},"shuffle_mb":${meter.readBytes / (1 << 20)},"shuffle_records":${meter.readRecords},"rank_sum":$sum}""")
        }
      }
    }

    if (modes("kcore")) {
      // (a) the 30-iteration PropertySpec shape (30 nodes, ~75 edges
      // after cleanup): per-round driver overhead dominates here
      val rnd = new scala.util.Random(11)
      val toy = Seq.fill(80)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }.distinct
      import spark.implicits._
      val toyDf = toy.toDF("src", "dst")
      val t0 = System.nanoTime()
      val nToy = force(Graph.kCore(toyDf, "src", "dst", k = 3, iters = 30))
      val wToy = (System.nanoTime() - t0) / 1e9
      // (b) the late-round shape where incremental degrees pay: a
      // 10k-node path at k=2 peels exactly its two endpoints per
      // round — 30 rounds remove ~60 of 10000 nodes, so a full
      // degree re-aggregation (2|E| shuffle records/round) is ~300x
      // the removed-edge delta. shuffle_records is the structural
      // measurement; wall_sec the practical one.
      val big = spark.range(9999).select(col("id").as("src"), (col("id") + 1).as("dst"))
      meter.reset()
      val t1 = System.nanoTime()
      val nBig = force(Graph.kCore(big, "src", "dst", k = 2, iters = 30))
      val wBig = (System.nanoTime() - t1) / 1e9
      println(s"""PROBE {"probe":"kcore","toy_rounds":30,"toy_survivors":$nToy,"toy_wall_sec":${f"$wToy%.2f"},"path_rounds":30,"path_survivors":$nBig,"path_wall_sec":${f"$wBig%.2f"},"path_shuffle_records":${meter.readRecords}}""")
    }

    spark.stop()
  }
}
