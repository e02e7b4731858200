package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the validation pass a 100 TB ingest runs
  * before anything downstream trusts the tables: per-column profiles
  * (cardinality, null rate, bounds) and referential-integrity orphan
  * detection. Both are plain aggregations/anti-joins so the same code
  * audits a 60k-row fixture and a petabyte lake (profiles are one
  * map-side-combined aggregation per column over one shared scan per
  * column set; orphan checks are hash anti-joins on the key).
  */
object Profiler {

  /** One profile row per requested column: total rows, nulls, exact
    * distinct count, and min/max rendered as strings (the
    * engine-portable envelope for heterogeneous column types). One
    * aggregation pass per column — Catalyst shares the scan when the
    * caller persists `df`; cardinality is EXACT (count distinct)
    * because profile correctness gates pipeline decisions; swap in
    * approx_count_distinct when 2% error is acceptable at scale.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("v_min"),
          max(col(c)).cast("string").as("v_max"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("v_min"), col("v_max"))
    }.reduce(_ unionAll _)
  }

  /** Orphaned foreign keys: child keys (non-null) with no matching
    * parent — returned as (key, n_rows) so hot orphans surface first.
    * A hash anti-join against the distinct parent keys; broadcast
    * when the parent is a dimension.
    */
  def referentialOrphans(child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame =
    child.select(childKey.as("orphan_key")).filter(col("orphan_key").isNotNull)
      .join(parent.select(parentKey.as("orphan_key")).distinct(),
        Seq("orphan_key"), "left_anti")
      .groupBy(col("orphan_key")).agg(count(lit(1)).as("n_rows"))

  /** Full referential audit: one row per declared (name, child, key,
    * parent, key) relationship with child row count and orphan count —
    * the report a lake-ingest gate reads. Each edge is an independent
    * aggregation + anti-join; totals are exact.
    */
  def auditReferences(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "at least one relationship required")
    edges.map { case (name, child, ck, parent, pk) =>
      val orphans = referentialOrphans(child, col(ck), parent, col(pk))
        .agg(coalesce(sum(col("n_rows")), lit(0L)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans)
        .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"))
    }.reduce(_ unionAll _)
  }
}
