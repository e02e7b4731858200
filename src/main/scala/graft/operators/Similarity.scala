package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{transform => transformArray}

/** Similarity search over embedding columns (SURVEY.md §2 B40-B41, B44).
  *
  * Vector math uses `zip_with`/`aggregate` higher-order functions with
  * LEFT-FOLD summation in double — bit-identical to any engine that
  * folds sequentially (the DuckDB oracle uses list_reduce), so cosine
  * scores and therefore rankings are reproducible exactly.
  *
  * 100 TB design:
  *  - brute-force top-k broadcasts the (small) query set and scans the
  *    corpus once; per-query ranking is a partitioned window, so the
  *    shuffle is bounded by |corpus| x |queries| candidate rows.
  *  - the scale path is LSH: random-hyperplane signatures are computed
  *    per row (narrow), and candidate generation is an equi-join on the
  *    bucket key — hash-partitioned, never a cross product. Hyperplanes
  *    are derived from md5 so signatures are engine-reproducible.
  */
object Similarity {

  /** Elementwise product sum (dot), left-fold in double. Backed by the
    * codegen'd [[graft.functions.DotProduct]] expression — bit-equal to
    * the `aggregate(zip_with(...))` higher-order formulation but ~5x
    * faster (tight primitive loop inside whole-stage codegen).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.vector.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** The cross-engine quantizer (see graft.functions.quantize). */
  def q6(c: Column): Column = graft.functions.quantize.q6(c)

  /** Brute-force cosine top-k: every query vector against the full
    * corpus; ties broken by corpus id. Query side must be small (it is
    * broadcast); corpus side streams.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_cos", cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), q6(col("_cos")).as("cos_sim"))
  }

  /** Deterministic pseudo-random hyperplane component: md5-derived
    * integer in [-1000, 1000] for (plane j, dimension i). Matches the
    * SQL formulation `CAST(concat('0x', substr(md5(j || '_' || i), 1,
    * 12)) AS BIGINT) % 2001 - 1000`.
    */
  def planeComponent(j: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${j}_$i".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 12)
    java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
  }

  /** Random-hyperplane LSH bucket id: sign bit of the projection onto
    * each of `nPlanes` fixed hyperplanes. One narrow projection per
    * row; no shuffle.
    */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val planes = (0 until nPlanes).map { j =>
      lit((0 until dim).map(i => planeComponent(j, i).toDouble).toArray)
    }
    (0 until nPlanes).map { j =>
      when(dot(vec, planes(j)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF-style ANN: partition the corpus into cells by nearest
    * centroid (the inverted file), then answer queries by probing only
    * the `nprobe` nearest cells. At 100 TB the corpus is stored
    * bucketed by cell id, so a query touches nprobe/k of the data;
    * centroids (k rows) broadcast everywhere.
    *
    * Composition: centroid table (from CentroidAggregator or any
    * k-means) -> cell assignment (broadcast argmin) -> candidate join
    * on cell id -> exact cosine top-k.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    // centroids: (cell: Int, ctr: Array[Double])
    def l2sq(v: Column, c: Column): Column =
      aggregate(zip_with(v, c, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, x) => acc + x)
    val cellW = Window.partitionBy(col("_id")).orderBy(col("_d"), col("cell"))
    def assign(df: DataFrame, n: Int): DataFrame =
      df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
        .crossJoin(broadcast(centroids))
        .withColumn("_d", q6(l2sq(col("_v"), col("ctr"))))
        .withColumn("_rn", row_number().over(cellW))
        .filter(col("_rn") <= n)
        .select(col("_id"), col("_v"), col("cell"))
    val corpusCells = assign(corpus, 1)
      .select(col("_id").as("neighbor_id"), col("_v").as("_cv"), col("cell"))
    val queryCells = assign(queries, nprobe)
      .select(col("_id").as("query_id"), col("_v").as("_qv"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("neighbor_id"))
    queryCells.join(corpusCells, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_cos", cosine(col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), q6(col("_cos")).as("cos_sim"))
  }

  /** ANN via LSH bucket equi-join: candidate pairs share a bucket;
    * exact cosine computed only for candidates.
    */
  def annBucketPairs(df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol).as("_v"),
      lshBucket(col(vecCol), nPlanes, dim).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id1"), col("_v").as("_v1"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id2"), col("_v").as("_v2"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("bucket"),
        q6(cosine(col("_v1"), col("_v2"))).as("cos_sim"))
  }
}
