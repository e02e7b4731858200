package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.FirehoseTransform

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: run the full Firehose wire-format pipeline end-to-end on
    * sf0.001 — events table -> CWL envelopes (to_json/gzip/base64) ->
    * decode/dispatch/transform (A3-A11) -> size governor (A12).
    * Exercises the whole reference data path; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val envelopes = queriesExt.PipelineQueries.envelopes(spark, dir)
    val framed = FirehoseTransform.frameRecords(envelopes, col("user_id"), col("envelope"))
    FirehoseTransform.sizeGovernor(FirehoseTransform.transform(framed))
  }

  private def allQ: Seq[queriesRelational.RelationalQueries.Q] =
    queriesRelational.RelationalQueries.list ++
      queriesRelational.SqlQueries.list ++
      queriesStreaming.StreamingQueries.list ++
      queriesExt.DedupQueries.list ++
      queriesExt.SimilarityQueries.list ++
      queriesExt.TextQueries.list ++
      queriesExt.CorpusQueries.list ++
      queriesExt.CurationQueries.list ++
      queriesExt.GraphQueries.list ++
      queriesExt.PipelineQueries.list ++
      queriesExt.LinkageQueries.list ++
      queriesExt.TemporalQueries.list

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(o =>
      q.name -> o.stripMargin.trim.replaceAll("\\s+", " "))).toMap
}
