package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Behavioral contract for the text-quality signals that have no SQL
  * oracle (q112 is rows-only by design — no engine mirrors gzip).
  */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("compressionRatio orders repetitive < natural < noise, and is deterministic") {
    val rnd = new scala.util.Random(3)
    val repetitive = "spam spam spam spam " * 50
    val natural = "the quick brown fox jumps over the lazy dog and then " +
      "wanders off to find some other interesting things to chase today " * 10
    val noise = Seq.fill(800)(rnd.nextPrintableChar()).mkString
    val df = Seq((1L, repetitive), (2L, natural), (3L, noise)).toDF("id", "text")
    val out = TextAnalysis.compressionRatio(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ratio")).toMap
    assert(out(1L) < out(2L) && out(2L) < out(3L),
      s"expected repetitive < natural < noise, got $out")
    assert(out.values.forall(r => r > 0.0 && r < 1.5), s"ratios out of range: $out")
    // gzip is deterministic: byte-identical second run
    val again = TextAnalysis.compressionRatio(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ratio")).toMap
    assert(again == out)
  }

  test("compressionRatio on the fixture corpus: plan is a narrow projection, values populated") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = TextAnalysis.compressionRatio(docs, "doc_id", "text")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "compression ratio must not shuffle")
    val rows = out.agg(count(lit(1)), min(col("ratio")), max(col("ratio"))).head()
    assert(rows.getLong(0) > 0)
    assert(rows.getDouble(1) > 0.0 && rows.getDouble(2) < 1.5)
  }
}
