package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("nearestCentroid fold matches the windowed argmin semantics (min dist, min cell on ties)") {
    // two centroids equidistant from v -> lowest cell must win
    val ctrs = Seq((2, Array(1.0, 0.0)), (1, Array(0.0, 1.0)), (3, Array(10.0, 10.0)))
      .toDF("cell", "ctr")
    val corpus = Seq((100L, vec(0.5, 0.5))).toDF("id", "v")
    val out = Similarity.assignCells(corpus, ctrs, "id", "v").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("cell") == 1, "tie must break to the lowest cell")
  }

  test("assignCells agrees with brute-force argmin on real embeddings") {
    val e = Tables.load(spark, sfDir, "embeddings").limit(50)
    val centroid = udaf(new graft.functions.CentroidAggregator(64))
    val ctrs = Tables.load(spark, sfDir, "embeddings")
      .groupBy(col("label").as("cell"))
      .agg(centroid(col("embedding")).as("ctr"))
    val fold = Similarity.assignCells(e, ctrs, "vec_id", "embedding")
      .select(col("_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("cell")).toMap
    // reference: explicit crossJoin + min over collected rows
    val ctrRows = ctrs.collect().map(r =>
      r.getAs[Int]("cell") -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val eRows = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    eRows.foreach { case (id, v) =>
      val best = ctrRows.map { case (cell, c) =>
        val d = v.zip(c).foldLeft(0.0) { case (acc, (x, y)) => acc + (x.toDouble - y) * (x.toDouble - y) }
        (math.floor(d * 1e6 + 0.5) / 1e6, cell)
      }.min
      assert(fold(id) == best._2, s"vec $id: fold=${fold(id)} brute=${best._2}")
    }
  }

  test("bandedAnnPairs maxBucket guardrail drops hot buckets") {
    // 40 identical vectors land in one bucket per band; 2 distinct
    // vectors elsewhere. With the cap, the hot bucket's ~780 pairs
    // disappear; without it they dominate.
    val hot = (1L to 40L).map(i => (i, vec(1.0, 1.0, 1.0, 1.0)))
    val cold = Seq((101L, vec(-1.0, -1.0, -1.0, -1.0)), (102L, vec(-1.0, -1.0, -1.0, -0.9)))
    val df = (hot ++ cold).toDF("id", "v")
    val unguarded = Similarity.bandedAnnPairs(df, "id", "v", nBands = 2, bitsPerBand = 2, dim = 4)
    val guarded = Similarity.bandedAnnPairs(df, "id", "v", nBands = 2, bitsPerBand = 2, dim = 4,
      maxBucket = Some(10))
    val unguardedHotPairs = unguarded.filter(col("id1") <= 40 && col("id2") <= 40).count()
    val guardedHotPairs = guarded.filter(col("id1") <= 40 && col("id2") <= 40).count()
    assert(unguardedHotPairs >= 780L, s"expected the hot-bucket blowup, got $unguardedHotPairs")
    assert(guardedHotPairs == 0L, s"cap must drop the hot bucket, got $guardedHotPairs")
    // the cold pair survives if it shares a band bucket
    assert(guarded.filter(col("id1") === 101L && col("id2") === 102L).count() ==
      unguarded.filter(col("id1") === 101L && col("id2") === 102L).count())
  }

  test("banded signatures: shared_bands counts agreeing bands exactly") {
    val df = Seq((1L, vec(1.0, 2.0, 3.0, 4.0)), (2L, vec(1.0, 2.0, 3.0, 4.0)))
      .toDF("id", "v")
    val out = Similarity.bandedAnnPairs(df, "id", "v", nBands = 3, bitsPerBand = 2, dim = 4)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("shared_bands") == 3L, "identical vectors agree on every band")
    assert(out.head.getAs[Double]("cos_sim") == 1.0)
  }

  test("PQ: a vector identical to an anchor encodes to that anchor's code in every subspace") {
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val cbs = graft.queriesExt.SimilarityQueries.pqCodebooks(e)
    val codes = Similarity.pqEncode(e, cbs, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> (0 until 8).map(i => r.getInt(i + 1))).toMap
    // anchors encode to themselves (distance 0 in every subspace)
    (0L until 16L).foreach { a =>
      assert(codes(a) == Seq.fill(8)(a.toInt), s"anchor $a -> ${codes(a)}")
    }
  }

  test("PQ encode plan: no corpus shuffle, no window (narrow argmin folds)") {
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val cbs = graft.queriesExt.SimilarityQueries.pqCodebooks(e)
    val plan = Similarity.pqEncode(e, cbs, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"encode must not window:\n${plan.take(1500)}")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"encode must not shuffle the corpus:\n${plan.take(1500)}")
  }

  test("PQ ADC top-k recall against exact brute force beats chance 10x (recall@5 >= 0.1)") {
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val cbs = graft.queriesExt.SimilarityQueries.pqCodebooks(e)
    val queries = e.filter(col("vec_id") % 97 === 0)
    val recall = pqRecallAt5(e, cbs, queries)
    // 16 UNTRAINED anchor codes x 8 subspaces is a deliberately coarse
    // codebook (production feeds k-means-trained codebooks, exactly as
    // ivfTopK is fed trained centroids); the contract under test is
    // that ADC ranking tracks true L2 far above chance. Measured:
    // 0.17 @ 16 anchors, 0.33 @ 64 (random-5-of-500 overlap ~ 0.01).
    assert(recall >= 0.1, s"PQ recall@5 = $recall (chance ~= 0.01)")
  }

  test("PQ shortlist + exact re-rank lifts recall@5 over plain ADC") {
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val cbs = graft.queriesExt.SimilarityQueries.pqCodebooks(e)
    val queries = e.filter(col("vec_id") % 97 === 0)
    val codes = Similarity.pqEncode(e, cbs, "vec_id", "embedding")
    def recallOf(pairs: Set[(Long, Long)]): Double = {
      val exact = exactTop5(e, queries)
      (pairs & exact).size.toDouble / exact.size
    }
    val adc = Similarity.pqTopK(codes, queries, cbs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = Similarity.pqTopKReranked(codes, e, queries, cbs,
        "vec_id", "embedding", k = 5, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (ra, rb) = (recallOf(adc), recallOf(rr))
    info(s"recall@5: ADC=$ra reranked=$rb")
    // exact re-rank of a 50-deep shortlist can only improve the cut
    // line; on these fixtures it should be a large lift (ADC ~0.17)
    assert(rb > ra, s"re-rank must lift recall: $rb vs $ra")
    assert(rb >= 0.5, s"50-deep exact re-rank recall@5 = $rb")
  }

  /** Exact L2 top-5 pairs for `queries` over corpus `e`. */
  private def exactTop5(e: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val l2w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("_d"), col("neighbor_id"))
    e.select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_d", Similarity.l2sq(col("_cv"), col("_qv")))
      .withColumn("rank", row_number().over(l2w)).filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
  }

  /** recall@5 of the PQ ADC ranking vs exact L2 top-5 on `e` for the
    * given codebooks — shared by the anchor-recall and trained-recall
    * tests so both measure the identical protocol.
    */
  private def pqRecallAt5(e: org.apache.spark.sql.DataFrame,
      cbs: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame): Double = {
    val codes = Similarity.pqEncode(e, cbs, "vec_id", "embedding")
    val pq = Similarity.pqTopK(codes, queries, cbs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = exactTop5(e, queries)
    (pq & exact).size.toDouble / exact.size
  }

  /** Total PQ quantization error (sum over subspaces of within-cell
    * squared distance) for a codebook on corpus `e` — the objective
    * ADC distance error is bounded by.
    */
  private def pqQuantMse(e: org.apache.spark.sql.DataFrame,
      cbs: org.apache.spark.sql.DataFrame): Double =
    (0 until 8).map { sIdx =>
      val sub = e.select(col("vec_id"),
        slice(col("embedding"), sIdx * 8 + 1, 8).as("_sv"))
      val ctrs = cbs.filter(col("subspace") === sIdx)
        .select(col("code").as("cell"), col("subvec").as("ctr"))
      Similarity.kmeansInertia(sub, ctrs, "vec_id", "_sv")
    }.sum

  test("trained PQ codebooks beat untrained anchors on spread-out embeddings (VERDICT r02 #7)") {
    // The shipped fixtures are label-CLUSTERED, which makes
    // per-subspace-trained codes tie anchor codes (the honest negative
    // result in SCALE.md round 2). On spread-out data training must
    // win. Synthesize a deterministic iid-uniform corpus (seeded;
    // training is deterministic too, so these numbers are exactly
    // reproducible) and assert BOTH claims: (1) the guaranteed one —
    // Lloyd training strictly reduces quantization MSE from the anchor
    // initialization (trainKMeans inits at the lowest-id vectors =
    // exactly the 16 anchors); (2) the empirical one — recall@5 of the
    // ADC ranking improves (measured 0.104 anchors -> 0.156 trained;
    // small-sample, but deterministic on this fixed corpus).
    val rnd = new scala.util.Random(42)
    val corpus = (0L until 1000L).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding").persist()
    try {
      val queries = corpus.filter(col("vec_id") % 20 === 0) // 50 queries
      val anchors = graft.queriesExt.SimilarityQueries.pqCodebooks(corpus)
      val trained = Similarity.trainPqCodebooks(
        corpus, "vec_id", "embedding", codes = 16, iters = 2)
      val mseAnchor = pqQuantMse(corpus, anchors)
      val mseTrained = pqQuantMse(corpus, trained)
      info(f"quantization MSE: anchors=$mseAnchor%.1f trained=$mseTrained%.1f")
      assert(mseTrained < mseAnchor * 0.9,
        s"training must cut quantization error: $mseTrained vs $mseAnchor")
      val rAnchor = pqRecallAt5(corpus, anchors, queries)
      val rTrained = pqRecallAt5(corpus, trained, queries)
      info(s"recall@5: anchors=$rAnchor trained=$rTrained")
      assert(rTrained > rAnchor,
        s"trained codebooks must beat anchors on spread data: $rTrained vs $rAnchor")
    } finally corpus.unpersist()
  }

  test("pqTopK excludes neighbors with incomplete code coverage instead of under-counting") {
    val cbs = Seq(
      (0, 0, Array(0.0, 0.0)), (0, 1, Array(1.0, 1.0)),
      (1, 0, Array(0.0, 0.0)), (1, 1, Array(1.0, 1.0))).toDF("subspace", "code", "subvec")
    // neighbor 11 carries the -1 sentinel (no codebook entry): with a
    // plain inner join its subspace-1 term would vanish and its
    // under-counted sum would OUTRANK neighbor 10 — the guard must
    // exclude it from the ranking entirely
    val codes = Seq((10L, 0, 1), (11L, 0, -1)).toDF("_id", "c0", "c1")
    val queries = Seq((99L, Array(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(codes, queries, cbs, "vec_id", "embedding",
        k = 5, nSub = 2, subDim = 2)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((10L, 1)))
  }

  test("int8Quantize: dequantization error bounded by half a quantization step; zero vector safe") {
    val e = Tables.load(spark, sfDir, "embeddings").limit(100)
    val rows = Similarity.int8Quantize(e, "vec_id", "embedding")
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      val scale = r.getDouble(r.fieldIndex("scale"))
      val orig = r.getSeq[Float](r.fieldIndex("embedding"))
      assert(codes.forall(c => c >= -127 && c <= 127))
      // max-abs element must hit +/-127 exactly
      assert(codes.exists(c => math.abs(c) == 127), s"scale element must saturate: $codes")
      val step = scale / 127.0
      codes.zip(orig).foreach { case (c, x) =>
        assert(math.abs(c * step - x) <= step / 2 + 1e-12,
          s"dequant error ${math.abs(c * step - x)} exceeds half-step ${step / 2}")
      }
    }
    // zero vector: scale 0, all-zero codes, no division blowup
    val z = Seq((1L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val zr = Similarity.int8Quantize(z, "vec_id", "embedding").collect().head
    assert(zr.getDouble(zr.fieldIndex("scale")) == 0.0)
    assert(zr.getSeq[Int](zr.fieldIndex("codes")).forall(_ == 0))
  }

  test("int8TopK recall vs exact float dot-product top-k stays high") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") % 97 === 0)
    val approx = Similarity.int8TopK(e, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // exact MIPS reference: rank by true float dot product
    val exact = {
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(Similarity.dot(col("_qv"), col("_cv")).desc, col("neighbor_id"))
      c.crossJoin(broadcast(q)).filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    val recalls = exact.map { case (q, want) => approx(q).intersect(want).size / 5.0 }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@5 $mean < 0.8 (per-query: $recalls)")
  }

  test("ivfPqTopK: probing all cells equals plain ADC+rerank; nprobe=3 retains recall@5") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val centroid = udaf(new graft.functions.CentroidAggregator(64))
    val centroids = e.groupBy(col("label").cast("int").as("cell"))
      .agg(centroid(col("embedding")).as("ctr"))
    val cbs = graft.queriesExt.SimilarityQueries.pqCodebooks(e)
    val queries = e.filter(col("vec_id") % 97 === 0)
    val nCells = centroids.count().toInt
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // equivalence: probing EVERY cell makes the IVF stage a no-op, so
    // the composition must reproduce pqTopKReranked exactly
    val full = Similarity.ivfPqTopK(e, queries, centroids, cbs, "vec_id", "embedding",
      k = 5, nprobe = nCells, shortlist = 20)
    val codes = Similarity.pqEncode(e, cbs, "vec_id", "embedding")
    val plain = Similarity.pqTopKReranked(codes, e, queries, cbs, "vec_id", "embedding",
      k = 5, shortlist = 20)
    assert(asSet(full) == asSet(plain),
      "nprobe = all cells must equal the unpruned ADC+rerank plan")
    // recall@5 vs exact ground truth: composed IVFxPQ vs plain ADC
    // (no rerank) vs IVF-exact, each against its own metric's truth
    def truthTop5(byCos: Boolean): Map[Long, Set[Long]] = {
      val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
      val base = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv"))
        .crossJoin(broadcast(qv)).filter(col("neighbor_id") =!= col("query_id"))
      val scored = if (byCos)
        base.withColumn("_s", Similarity.cosine(col("_qv"), col("_cv")))
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("query_id")).orderBy(col("_s").desc, col("neighbor_id"))))
      else
        base.withColumn("_s", Similarity.l2sq(col("_cv"), col("_qv")))
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("query_id")).orderBy(col("_s"), col("neighbor_id"))))
      scored.filter(col("rank") <= 5).select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    def recall(df: org.apache.spark.sql.DataFrame, truth: Map[Long, Set[Long]]): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      truth.map { case (q, want) =>
        got.getOrElse(q, Set.empty[Long]).intersect(want).size / 5.0 }.sum / truth.size
    }
    val l2Truth = truthTop5(byCos = false)
    val rIvfPq = recall(Similarity.ivfPqTopK(e, queries, centroids, cbs,
      "vec_id", "embedding", k = 5, nprobe = 3, shortlist = 20), l2Truth)
    val rAdcOnly = recall(Similarity.pqTopK(codes, queries, cbs,
      "vec_id", "embedding", k = 5), l2Truth)
    val rIvfExact = recall(Similarity.ivfTopK(e, queries, centroids,
      "vec_id", "embedding", k = 5, nprobe = 3), truthTop5(byCos = true))
    info(s"recall@5 — ivfPq(nprobe=3): $rIvfPq, ADC-only: $rAdcOnly, IVF-exact(nprobe=3): $rIvfExact")
    // the fixture codebooks are 16 UNTRAINED anchors (so a SQL oracle
    // can replay them) — absolute recall is fixture-bound (~0.17 ADC).
    // The properties that must hold regardless: the exact re-rank
    // recovers ADC mis-rankings even under cell pruning, and the
    // composition stays above a sanity floor.
    assert(rIvfPq > rAdcOnly,
      s"exact rerank must beat ADC-only ranking: $rIvfPq vs $rAdcOnly")
    assert(rIvfPq >= 0.2, s"composed IVFxPQ recall@5 $rIvfPq below sanity floor")
  }

  test("mmrRerank diversifies: the duplicate that plain top-k keeps is displaced by a distinct candidate") {
    // corpus: 1 and 2 are identical (both exactly the query direction),
    // 3 sits at 45 degrees. Plain top-2 = {1, 2}; MMR with a heavy
    // diversity weight keeps 1 then jumps to 3.
    val corpus = Seq(
      (1L, vec(1.0, 0.0)), (2L, vec(1.0, 0.0)), (3L, vec(0.7071, 0.7071)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, vec(1.0, 0.0))).toDF("vec_id", "embedding")
    val plain = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 2)
      .orderBy(col("rank")).select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(plain == Seq(1L, 2L), s"premise: plain top-2 keeps the duplicate: $plain")
    val mmr = Similarity.mmrRerank(corpus, queries, "vec_id", "embedding",
        k = 2, shortlist = 3, relWeight = 0.3, divWeight = 0.7)
      .orderBy(col("mmr_rank")).select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(mmr == Seq(1L, 3L), s"MMR must displace the duplicate: $mmr")
    // determinism: identical rel ties broke to the smaller id at step 1
    val again = Similarity.mmrRerank(corpus, queries, "vec_id", "embedding",
        k = 2, shortlist = 3, relWeight = 0.3, divWeight = 0.7)
      .orderBy(col("mmr_rank")).select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(again == mmr)
  }

  test("mmrRerank: a query with fewer than k candidates is omitted, never null-padded") {
    // corpus of 2 != query id -> shortlist gathers 2 candidates; k=3
    // cannot be seeded, so the query drops out entirely (contract)
    val corpus = Seq((1L, vec(1.0, 0.0)), (2L, vec(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, vec(1.0, 0.0))).toDF("vec_id", "embedding")
    val short = Similarity.mmrRerank(corpus, queries, "vec_id", "embedding",
      k = 3, shortlist = 3)
    assert(short.count() == 0, "under-filled shortlist must omit the query")
    val ok = Similarity.mmrRerank(corpus, queries, "vec_id", "embedding",
      k = 2, shortlist = 3)
    assert(ok.count() == 2 && ok.filter(col("neighbor_id").isNull).count() == 0)
    // non-numeric id columns fail fast at the contract, not at analysis
    val strCorpus = Seq(("a", vec(1.0, 0.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(strCorpus, strCorpus, "vec_id", "embedding", k = 1, shortlist = 1)
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }

  test("reciprocalRankFusion: consensus beats a single first place; absent-from-one-list still fuses") {
    import spark.implicits._
    // ranker A: 10 first, 20 second, 30 third; ranker B: 20 first, 30 second (10 absent)
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3)).toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "neighbor_id", "rank")
    val fused = Similarity.reciprocalRankFusion(Seq(a, b), k = 60, topK = 3)
      .orderBy(col("fused_rank"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    // 20: 1/62 + 1/61 ~ .0325 beats 10: 1/61 ~ .0164; 30: 1/63 + 1/62 ~ .0320 also beats 10
    assert(fused == Seq((20L, 1), (30L, 2), (10L, 3)), s"fusion order wrong: $fused")
  }

  test("ivf occupancy drift: vanished cells dominate the PSI signal, a same-mix load scores ~zero") {
    // the q210 re-index monitor: assignCells + psiCategorical. The
    // planted drift drops labels 7-9 entirely — their cells must
    // carry the LARGEST contributions (vanished-category path), and
    // a current load with the SAME mix must score ~0 everywhere.
    import graft.functions.CentroidAggregator
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val centroidUdaf = udaf(new CentroidAggregator(64))
    val centroids = e.groupBy(col("label").cast("int").as("cell"))
      .agg(centroidUdaf(col("embedding")).as("ctr"))
    val base = Similarity.assignCells(e, centroids, "vec_id", "embedding")
    val drifted = Similarity.assignCells(
      e.filter(col("vec_id") % 3 === 0 && col("label") < 7),
      centroids, "vec_id", "embedding")
    val psi = graft.operators.Profiler.psiCategorical(base, drifted, col("cell"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // every dropped-label cell contributes positively, the single
    // largest contribution is a dropped cell, and the total crosses
    // the classic PSI >= 0.1 "significant shift" action threshold —
    // i.e. the monitor actually fires a re-index on this drift.
    // (Label mass spreads across argmin cells, so surviving cells
    // that absorbed dropped-label vectors legitimately shift too —
    // asserting per-cell dominance for ALL dropped cells would claim
    // more than occupancy drift means.)
    val vanished = Seq("7", "8", "9").map(psi)
    assert(vanished.forall(_ > 0), s"dropped cells must contribute: $psi")
    assert(psi.maxBy(_._2)._1 == "7",
      s"the heaviest contribution must be a dropped cell: $psi")
    assert(psi.values.sum > 100000L,
      s"total micro-PSI must cross the 0.1 action threshold: ${psi.values.sum}")
    // self-comparison: every cell's contribution is exactly 0
    val self = graft.operators.Profiler.psiCategorical(base, base, col("cell"))
      .collect().map(_.getLong(3))
    assert(self.forall(_ == 0L), s"same mix must score zero: ${self.toSeq}")
  }

  test("trainKMeans: inertia decreases monotonically and training is deterministic") {
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val inertias = Seq(0, 1, 2).map { it =>
      Similarity.kmeansInertia(e,
        Similarity.trainKMeans(e, "vec_id", "embedding", k = 16, iters = it, dim = 64),
        "vec_id", "embedding")
    }
    // measured 754 -> 452 -> 448 on this corpus; Lloyd's never increases
    assert(inertias.sliding(2).forall(w => w(1) <= w(0) + 1e-9),
      s"inertia must not increase: $inertias")
    assert(inertias.head - inertias.last > 100.0, s"training barely moved: $inertias")
    val run = () => Similarity.trainKMeans(e, "vec_id", "embedding", 16, 2, 64)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(run() == run(), "identical inputs must train identical centroids")
  }

  test("trainKMeans gridUnits: every centroid lands on the grid and training still converges") {
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val snapped = Similarity.trainKMeans(e, "vec_id", "embedding",
      k = 16, iters = 2, dim = 64, gridUnits = 1000000L)
    val ctrs = snapped.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(ctrs.nonEmpty)
    // snapping contract: every dimension is a fixpoint of the snap
    // (m/1e6 is not binary-exact, so test idempotence, not c*1e6 ∈ Z)
    ctrs.values.flatten.foreach { c =>
      assert(c == math.floor(c * 1e6 + 0.5) / 1e6, s"off-grid centroid value $c")
    }
    // snapped training is still training: inertia well below init's
    val inertia = Similarity.kmeansInertia(e, snapped, "vec_id", "embedding")
    val init = Similarity.kmeansInertia(e,
      Similarity.trainKMeans(e, "vec_id", "embedding", 16, 0, 64),
      "vec_id", "embedding")
    assert(inertia < init - 100.0, s"snapped training barely moved: $init -> $inertia")
  }

  test("OPQ rotation is orthogonal and cuts quantization error on anisotropic embeddings") {
    // The canonical OPQ regime (Ge et al., CVPR'13): per-dimension
    // variance decays 0.93^d across the 64 dims, so the default
    // subspace split gives subspace 0 almost all the variance and
    // subspace 7 almost none — plain per-subspace PQ wastes 16 codes
    // on near-constant slices. The learned rotation re-balances
    // variance across subspaces; quantization MSE must drop. Seeded +
    // deterministic training = reproducible numbers.
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 600L).map { i =>
      (i, Array.tabulate(64)(d => (rnd.nextGaussian() * math.pow(0.93, d)).toFloat))
    }.toDF("vec_id", "embedding").persist()
    try {
      val plain = Similarity.trainPqCodebooks(
        corpus, "vec_id", "embedding", codes = 16, iters = 2)
      val msePlain = pqQuantMse(corpus, plain)

      val (r, cbs) = Similarity.trainOpq(
        corpus, "vec_id", "embedding", kmIters = 2, opqIters = 3)

      // R^T R = I to machine precision — rotated-space L2 equals
      // original-space L2, so the ADC ranking still approximates the
      // same ground truth
      val dim = 64
      var maxDev = 0.0
      for (i <- 0 until dim; j <- 0 until dim) {
        var s = 0.0
        var k = 0
        while (k < dim) { s += r(k * dim + i) * r(k * dim + j); k += 1 }
        maxDev = math.max(maxDev, math.abs(s - (if (i == j) 1.0 else 0.0)))
      }
      assert(maxDev < 1e-9, s"rotation not orthogonal: max |R^T R - I| = $maxDev")

      val rotated = corpus.select(col("vec_id"),
        Similarity.rotateVec(col("embedding"), r, dim).as("embedding"))
      val mseOpq = pqQuantMse(rotated, cbs)
      info(f"quantization MSE: plain PQ=$msePlain%.2f OPQ=$mseOpq%.2f")
      assert(mseOpq < msePlain * 0.9,
        s"OPQ must cut quantization error >10%: $mseOpq vs $msePlain")

      // end-to-end: OPQ ADC recall@5 vs plain-PQ ADC recall@5 against
      // exact L2 on the ORIGINAL vectors (empirical on this fixture —
      // the guaranteed claim above is the MSE drop)
      val queries = corpus.filter(col("vec_id") % 20 === 0)
      val exact = exactTop5(corpus, queries)
      val plainTop = Similarity.pqTopK(
        Similarity.pqEncode(corpus, plain, "vec_id", "embedding"),
        queries, plain, "vec_id", "embedding", k = 5)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val opqTop = Similarity.opqTopK(
        Similarity.opqEncode(corpus, r, cbs, "vec_id", "embedding"),
        queries, r, cbs, "vec_id", "embedding", k = 5)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val recallPlain = (plainTop & exact).size.toDouble / exact.size
      val recallOpq = (opqTop & exact).size.toDouble / exact.size
      info(s"recall@5 vs exact L2: plain=$recallPlain opq=$recallOpq")
      assert(recallOpq >= recallPlain,
        s"OPQ recall must not regress: $recallOpq vs $recallPlain")
    } finally corpus.unpersist()
  }

  test("hardNegatives: same-label vectors never mine as negatives; ranking matches the filtered brute force") {
    import graft.operators.Similarity
    val e = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding", "label")
    val queries = e.filter(col("vec_id") < 3)
    val got = Similarity.hardNegatives(e, queries, "vec_id", "embedding", "label", k = 4)
    val rows = got.collect()
    assert(rows.nonEmpty && rows.length == queries.count() * 4)
    // no negative shares its anchor's label
    val qLabels = queries.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => r.getAs[Int]("neighbor_label") != qLabels(r.getAs[Long]("query_id"))),
      "a same-label vector leaked into the negatives")
    // equivalent to brute-force top-k over the label-filtered corpus,
    // per query (the filter commutes with the ranking)
    val want = qLabels.toSeq.flatMap { case (qid, ql) =>
      Similarity.bruteForceTopK(e.filter(col("label") =!= ql),
          e.filter(col("vec_id") === qid), "vec_id", "embedding", k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    }.toSet
    assert(rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
      r.getAs[Int]("rank"))).toSet == want)
    // the scan stays a broadcast loop — no shuffle of the corpus side
    assert(!got.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
  }
}
