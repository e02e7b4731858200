package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "a b c d"),
    (2L, "en", "e f"),
    (3L, "fr", "g h i"),
    (4L, "fr", "j"),
    (5L, "zh", "k l m n o")).toDF("doc_id", "lang", "text")

  test("stratified sample is deterministic and respects rate extremes") {
    val all = CorpusOps.stratifiedSample(docs, col("doc_id"), col("lang"),
      rates = Map.empty, defaultRate = 1.0)
    assert(all.count() == 5)
    val none = CorpusOps.stratifiedSample(docs, col("doc_id"), col("lang"),
      rates = Map.empty, defaultRate = 0.0)
    assert(none.count() == 0)
    val a = CorpusOps.stratifiedSample(docs, col("doc_id"), col("lang"),
      rates = Map("en" -> 0.5), defaultRate = 0.25).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = CorpusOps.stratifiedSample(docs, col("doc_id"), col("lang"),
      rates = Map("en" -> 0.5), defaultRate = 0.25).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // hash-based, not rand(): identical across runs
  }

  test("sequence packing: offsets are running sums per shard and boundary spans are flagged") {
    val df = Seq(
      (1L, "s1", 300L), (2L, "s1", 300L), (3L, "s1", 100L),
      (10L, "s2", 512L), (11L, "s2", 1L)).toDF("doc_id", "source", "n")
    val out = CorpusOps.packSequences(df, col("doc_id"), col("source"), col("n"), budget = 512)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))).toMap
    // shard s1: doc1 [0,300) in seq 0; doc2 [300,600) spans 0->1; doc3 [600,700) in seq 1
    assert(out(1L) == ((0L, 0L, 0L, 0)))
    assert(out(2L) == ((300L, 0L, 1L, 1)))
    assert(out(3L) == ((600L, 1L, 1L, 0)))
    // shard s2 offsets restart: doc10 fills seq 0 exactly, doc11 starts seq 1
    assert(out(10L) == ((0L, 0L, 0L, 0)))
    assert(out(11L) == ((512L, 1L, 1L, 0)))
  }
}
