package graft.queriesExt

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.CorpusOps
import graft.queriesRelational.RelationalQueries.Q

/** Oracle corpus for the corpus-curation operators (deterministic
  * stratified sampling, token-length histograms, sequence packing) —
  * the data-shaping steps between dedup/quality-filtering and the
  * training loader.
  */
object CorpusQueries {

  /** Deterministic stratified sampling by language. Rates are chosen
    * binary-exact (0.25/0.75/0.5) so rate*buckets compares identically
    * in every engine. The filter is a narrow hash + CASE — zero
    * shuffle; at 100 TB this prunes the corpus in the scan stage.
    */
  private val q78 = Q("q78_stratified_sample", (s, dir) => {
    CorpusOps.stratifiedSample(
        Tables.load(s, dir, "documents"),
        col("doc_id"), col("lang"),
        rates = Map("en" -> 0.25, "zh" -> 0.75), defaultRate = 0.5)
      .select(col("doc_id"), col("lang"), col("sample_bucket"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH b AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 1000 AS sample_bucket
      FROM documents)
    SELECT doc_id, lang, sample_bucket
    FROM b
    WHERE sample_bucket < (CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.75 ELSE 0.5 END) * 1000
    ORDER BY doc_id"""))

  /** Token-length histogram per language: decile-ish buckets of 10
    * tokens capped at 15 (the long tail folds into the top bucket).
    * One map-side-combinable groupBy of (lang, bucket) — the shuffle
    * carries bucket counters, not documents.
    */
  private val q79 = Q("q79_token_histogram", (s, dir) => {
    val nTok = size(split(col("text"), " ")).cast("long")
    Tables.load(s, dir, "documents")
      .select(col("lang"), least(floor(nTok / 10).cast("long"), lit(15L)).as("bucket"), nTok.as("n_tok"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("lang"), col("bucket"))
  }, Some("""
    WITH t AS (
      SELECT lang,
             least(CAST(floor(len(string_split(text, ' ')) / 10.0) AS BIGINT), 15) AS bucket,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents)
    SELECT lang, bucket, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM t GROUP BY lang, bucket ORDER BY lang, bucket"""))

  /** Context-window sequence packing (concat-then-chop at 512 tokens,
    * per source shard in doc_id order) — the final layout step before
    * a pre-training loader. Per-shard running-sum window; the only
    * shuffle is on the shard key.
    */
  private val q80 = Q("q80_sequence_packing", (s, dir) => {
    CorpusOps.packSequences(
        Tables.load(s, dir, "documents"),
        col("doc_id"), col("source"),
        size(split(col("text"), " ")), budget = 512)
      .orderBy(col("doc_id"))
  }, Some("""
    WITH t AS (
      SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents),
    packed AS (
      SELECT doc_id, source, n_tok,
             CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
      FROM t)
    SELECT doc_id, source, n_tok, start_off,
           CAST(floor(start_off / 512.0) AS BIGINT) AS seq_first,
           CAST(floor((start_off + n_tok - 1) / 512.0) AS BIGINT) AS seq_last,
           CAST(CAST(floor((start_off + n_tok - 1) / 512.0) AS BIGINT) >
                CAST(floor(start_off / 512.0) AS BIGINT) AS INT) AS spans_boundary
    FROM packed ORDER BY doc_id"""))

  /** Deterministic train/val/test/holdout split. Weights are chosen to
    * exercise the integer-bound arithmetic the operator documents:
    * cumulative 0.45+0.45+0.05 accumulates to 0.9500000000000001 in
    * IEEE double, and `round(cum/total*buckets)` pins the boundary
    * bucket to 950 on every engine — the oracle hardcodes the
    * independently-computed bounds (450/900/950) over the same
    * md5-prefix hash, so a drift in either side's arithmetic surfaces
    * as a hash mismatch.
    */
  private val q96 = Q("q96_train_split", (s, dir) => {
    CorpusOps.assignSplit(
        Tables.load(s, dir, "documents"), col("doc_id"),
        splits = Seq(("train", 0.45), ("val", 0.45), ("test", 0.05), ("holdout", 0.05)))
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH b AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 1000 AS bucket
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN bucket < 450 THEN 'train'
                WHEN bucket < 900 THEN 'val'
                WHEN bucket < 950 THEN 'test'
                ELSE 'holdout' END AS split
    FROM b ORDER BY doc_id"""))

  val list: Seq[Q] = Seq(q78, q79, q80, q96)
}
