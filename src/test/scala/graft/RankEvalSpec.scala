package graft

import org.apache.spark.sql.functions._

import graft.operators.RankEval

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def disc(r: Int): Long = RankEval.discountMicros(10)
    .toMap.apply(r)
  private def c(rel: Long, r: Int): Long = rel * 1000000000000L / disc(r)

  test("discountMicros: log2 ladder quantized to micro, rank 1 is exactly 1e6") {
    val d = RankEval.discountMicros(3).toMap
    assert(d(1) == 1000000L) // log2(2) = 1
    assert(d(2) == math.floor(math.log(3.0) / math.log(2.0) * 1e6 + 0.5).toLong)
    assert(d(3) == 2000000L) // log2(4) = 2
  }

  test("ndcgAtK: perfect ranking scores 1e6, reversed scores less, hand-checked sums") {
    val judged = Seq(("q1", "d1", 3L), ("q1", "d2", 2L), ("q1", "d3", 1L))
      .toDF("q", "doc", "rel")
    val perfect = Seq(("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3))
      .toDF("q", "doc", "rnk")
    val gotP = RankEval.ndcgAtK(perfect, judged, "q", "doc", "rnk", "rel", 10)
      .as[(String, Long, Long, Option[Long])].collect().toSet
    val ideal = c(3, 1) + c(2, 2) + c(1, 3)
    assert(gotP == Set(("q1", ideal, ideal, Some(1000000L))), s"perfect: $gotP")
    val reversed = Seq(("q1", "d3", 1), ("q1", "d2", 2), ("q1", "d1", 3))
      .toDF("q", "doc", "rnk")
    val gotR = RankEval.ndcgAtK(reversed, judged, "q", "doc", "rnk", "rel", 10)
      .as[(String, Long, Long, Option[Long])].collect().head
    val revDcg = c(1, 1) + c(2, 2) + c(3, 3)
    assert(gotR == (("q1", revDcg, ideal, Some(revDcg * 1000000L / ideal))),
      s"reversed: $gotR")
    assert(gotR._4.get < 1000000L, "a worse ordering must score below 1.0")
  }

  test("ndcgAtK: unjudged docs score 0, empty system output scores 0, all-zero judgments null out") {
    val judged = Seq(("qa", "d1", 2L), ("qa", "d2", 1L),
      ("qb", "d9", 1L), ("qz", "d5", 0L)).toDF("q", "doc", "rel")
    // qa's system list leads with an UNJUDGED doc (counts 0 but
    // consumes rank 1); qb returns nothing; qz has judgments but no
    // positive grade
    val ranked = Seq(("qa", "dX", 1), ("qa", "d1", 2), ("qa", "d2", 3))
      .toDF("q", "doc", "rnk")
    val got = RankEval.ndcgAtK(ranked, judged, "q", "doc", "rnk", "rel", 10)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val idealA = c(2, 1) + c(1, 2)
    val dcgA = c(2, 2) + c(1, 3)
    assert(got("qa") == ((dcgA, idealA, Some(dcgA * 1000000L / idealA))), got.toString)
    assert(got("qb") == ((0L, c(1, 1), Some(0L))), "absent output must score 0, not vanish")
    assert(got("qz")._3.isEmpty, "zero ideal DCG must yield null, not divide")
    assert(got.size == 3)
  }

  test("ndcgAtK: rows past k are ignored; the ideal ordering tie-breaks on doc id") {
    // rel ties between d1/d2: ideal order is (doc asc) d1 then d2 —
    // a system emitting d2 first still scores 1.0 because the
    // contributions are symmetric under equal rel
    val judged = Seq(("q", "d1", 1L), ("q", "d2", 1L)).toDF("q", "doc", "rel")
    val sys = Seq(("q", "d2", 1), ("q", "d1", 2), ("q", "junk", 3))
      .toDF("q", "doc", "rnk")
    val got = RankEval.ndcgAtK(sys, judged, "q", "doc", "rnk", "rel", 2)
      .as[(String, Long, Long, Option[Long])].collect().head
    val ideal = c(1, 1) + c(1, 2)
    assert(got == (("q", ideal, ideal, Some(1000000L))), got.toString)
  }
}
