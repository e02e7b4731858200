package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics — the evaluation harness for the retrieval
  * family (brute-force/banded/IVF/PQ/int8 top-k, BM25, hybrid RRF):
  * given a system's ranked candidates and graded relevance judgments,
  * score each query with nDCG@k — the standard graded-relevance
  * ranking metric (Järvelin & Kekäläinen 2002). The q184 recall probe
  * answers "did the candidates show up at all"; this answers "did the
  * ordering put the most relevant ones first", which is the number an
  * ANN knob sweep (nprobe, bands, bits) actually trades against cost.
  *
  * Determinism: the rank discount 1/log2(rank+1) is quantized ONCE at
  * the driver — l_micro(r) = floor(log2(r+1)·1e6 + 0.5), k literals
  * embedded in the plan (and in the oracle's VALUES list, so no
  * engine-side transcendental is ever compared) — and each
  * contribution is the exact integer quotient rel·1e12 div l_micro.
  * dcg/idcg are long sums of those quotients; ndcg_micro =
  * dcg·1e6 div idcg.
  *
  * Scale shape: one broadcast-sized discount map (k entries) embedded
  * as a literal map lookup — no join for the discount; one left join
  * of the top-k slice against the judgments on (query, doc) — both
  * sides shuffle on the query+doc key, the slice is k·|queries| rows,
  * judgments are eval-set-sized (small by nature, like q84's
  * decontamination splits); the ideal ranking is one window over the
  * judgments alone. Nothing scales with the corpus — only with
  * |queries|·k.
  */
object RankEval {

  /** floor(log2(r+1)·1e6 + 0.5) for r = 1..k — the quantized discount
    * ladder shared by the plan and the oracle. */
  def discountMicros(k: Int): Seq[(Int, Long)] =
    (1 to k).map(r => r ->
      math.floor(math.log(r + 1.0) / math.log(2.0) * 1e6 + 0.5).toLong)

  /** Per-query nDCG@k.
    *
    * @param ranked (queryCol, docCol, rankCol) — the system output;
    *        rankCol is 1-based, rows past k are ignored
    * @param judgments (queryCol, docCol, relCol) — graded relevance,
    *        non-negative integers; docs absent from it score 0
    * Output: (queryCol, dcg_unit, idcg_unit, ndcg_micro) where the
    * unit sums are in rel·1e6 units (rel·1e12 div l_micro) and
    * ndcg_micro is null for queries whose ideal DCG is 0 (no positive
    * judgments). Queries come from the JUDGMENTS side — a system that
    * returns nothing for a judged query scores 0, not absent.
    */
  def ndcgAtK(ranked: DataFrame, judgments: DataFrame, queryCol: String,
      docCol: String, rankCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val disc = discountMicros(k)
    def discOf(rank: Column): Column = element_at(
      map(disc.flatMap { case (r, m) => Seq(lit(r), lit(m)) }: _*), rank)

    val dcg = ranked.where(col(rankCol) <= k)
      .join(judgments.select(col(queryCol), col(docCol),
        col(relCol).as("_rel")), Seq(queryCol, docCol), "left")
      .select(col(queryCol),
        (coalesce(col("_rel"), lit(0L)).cast("long") * lit(1000000000000L)
          ).as("_num"), discOf(col(rankCol)).as("_disc"))
      .select(col(queryCol), expr("_num div _disc").as("_c"))
      .groupBy(col(queryCol)).agg(sum(col("_c")).as("dcg_unit"))

    val wIdeal = Window.partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(docCol))
    val idcg = judgments
      .withColumn("_irank", row_number().over(wIdeal))
      .where(col("_irank") <= k)
      .select(col(queryCol),
        (col(relCol).cast("long") * lit(1000000000000L)).as("_num"),
        discOf(col("_irank")).as("_disc"))
      .select(col(queryCol), expr("_num div _disc").as("_c"))
      .groupBy(col(queryCol)).agg(sum(col("_c")).as("idcg_unit"))

    idcg.join(dcg, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("dcg_unit"), lit(0L)).as("dcg_unit"),
        col("idcg_unit"),
        when(col("idcg_unit") > 0,
          expr("coalesce(dcg_unit, 0L) * 1000000L div idcg_unit"))
          .as("ndcg_micro"))
  }
}
