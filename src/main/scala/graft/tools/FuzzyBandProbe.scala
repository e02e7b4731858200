package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** SCALE.md probe (round 18): fuzzyDecontaminate band-join cost at
  * rowsPerBand 1 vs 2, with and without the maxBucket guardrail, at
  * 1x and 10x corpus. Measures candidate-pair count (the band join's
  * output before verify) and wall for the full operator. The 10x
  * corpus is the sf0.1 documents table replicated with shifted ids —
  * same text distribution, so hot minhash buckets grow 10x wide,
  * which is exactly the degradation the guardrail bounds.
  */
object FuzzyBandProbe extends App {
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[32]").config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  import graft.operators.Dedup
  val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val docs = graft.Tables.load(spark, sf, "documents")
    .filter(col("doc_id").isNotNull && col("text").isNotNull)
    .select(col("doc_id"), col("text"))
  val toks = split(col("text"), " ")
  val eval = docs.filter(col("doc_id") % 83 === 0)
    .select((col("doc_id") + 10000000L).as("doc_id"),
      array_join(transform(
        filter(sequence(lit(1), size(toks)), i => i % 7 =!= 4),
        i => element_at(toks, i)), " ").as("text"))
  val evalSh = Dedup.prepareHashedShingles(eval, "doc_id",
    Dedup.wordShingles("text"))
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  evalSh.count()

  def corpusAt(mult: Int): DataFrame = {
    val base = (0 until mult).map(m =>
      docs.select((col("doc_id") + lit(m * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    Dedup.prepareHashedShingles(base, "doc_id", Dedup.wordShingles("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  for (mult <- Seq(1, 10)) {
    val corpusSh = corpusAt(mult)
    corpusSh.count()
    for ((rpb, cap) <- Seq((1, None), (1, Some(64)), (2, None))) {
      // candidate count = the band join's distinct pair output; rebuild
      // the cands fragment exactly as the operator does
      def bandsOf(df: DataFrame) = Dedup.lshBands(
        Dedup.minhashSignaturesHashed(
          df.select(col("doc_id"), explode_outer(col("_hs")).as("_h")),
          "doc_id", col("_h"), 8),
        "doc_id", 8, rpb)
      val cb = bandsOf(corpusSh).select(col("doc_id"), col("band_idx"), col("band_key"))
      val cbp = cap match {
        case Some(c) =>
          val small = cb.groupBy(col("band_idx"), col("band_key"))
            .agg(count(lit(1)).as("_n")).filter(col("_n") <= c)
            .select(col("band_idx"), col("band_key"))
          cb.join(small, Seq("band_idx", "band_key"))
        case None => cb
      }
      val cands = cbp
        .join(bandsOf(evalSh).select(col("doc_id").as("eval_id"),
          col("band_idx"), col("band_key")), Seq("band_idx", "band_key"))
        .select(col("doc_id"), col("eval_id")).distinct().count()
      val t0 = System.nanoTime()
      val flagged = Dedup.fuzzyDecontaminate(corpusSh, evalSh, "doc_id",
        0.4, rowsPerBand = rpb, maxBucket = cap).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"FUZZY mult=${mult}x rowsPerBand=$rpb cap=${cap.getOrElse(-1)} " +
        f"cands=$cands flagged=$flagged wall=$wall%.2f s")
    }
    corpusSh.unpersist()
  }
  spark.stop()
}
