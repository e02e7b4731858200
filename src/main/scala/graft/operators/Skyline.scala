package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction: the rows no other row beats on
  * every criterion at once — price/latency frontiers, quality/size
  * trade-off curves, cheapest-and-smallest part selection. Two-criteria
  * form, both MINIMIZED; negate a column to maximize it.
  *
  * Domination: r is dominated iff some s has s.x <= r.x AND s.y <= r.y
  * with at least one strict. Duplicates of a frontier point all
  * survive (no strict coordinate between them).
  *
  * Scale design — the naive formulations both fail at 100 TB: the
  * NOT-EXISTS theta-join is O(n^2), and the textbook "sort by x, keep
  * running min of y" window is a GLOBAL order (Spark plans an empty
  * partition spec — every row through one task). This operator
  * range-buckets x and splits the running minimum into
  *
  *  - a per-bucket aggregate (one row per bucket) whose cumulative min
  *    runs on the TINY bucket table (the only single-partition window,
  *    over ~thousands of rows, then broadcast back), and
  *  - per-row windows PARTITIONED BY bucket (parallel across buckets)
  *    for the strictly-smaller-x-in-my-bucket and equal-x cases.
  *
  * Total cost: one shuffle on the bucket key + a broadcast of the
  * bucket summary. The x column must be integer-valued (cents/sizes —
  * the repo's determinism grid), so RANGE frames and bucket arithmetic
  * are exact.
  */
object Skyline {

  /** @param xCol integer-valued criterion 1 (minimized)
    * @param yCol integer-valued criterion 2 (minimized)
    * @param bucketWidth width of the x range-buckets; pick so the
    *        bucket count lands in the thousands (bucket table must
    *        broadcast). Any positive value is CORRECT — width only
    *        tunes the small-table size.
    */
  def skyline2D(df: DataFrame, xCol: Column, yCol: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val withB = df.withColumn("_x", xCol.cast("long"))
      .withColumn("_y", yCol.cast("long"))
      .withColumn("_bkt", floor(col("_x") / bucketWidth).cast("long"))
    // tiny per-bucket summary: min y of all STRICTLY LOWER buckets
    // (every row there has x < any row here)
    val bktAgg = withB.groupBy(col("_bkt")).agg(min(col("_y")).as("_bmin"))
    val wPrev = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMin = bktAgg
      .withColumn("_prevmin", min(col("_bmin")).over(wPrev))
      .select(col("_bkt"), col("_prevmin"))
    // per-bucket windows (parallel): strictly-smaller x in my bucket;
    // equal x anywhere in my bucket (same bucket by construction)
    val wStrict = Window.partitionBy(col("_bkt")).orderBy(col("_x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameX = Window.partitionBy(col("_bkt"), col("_x"))
    val marked = withB.join(broadcast(prevMin), "_bkt")
      .withColumn("_minStrict", min(col("_y")).over(wStrict))
      .withColumn("_minSameX", min(col("_y")).over(wSameX))
      .withColumn("_dominated",
        (col("_prevmin").isNotNull && col("_prevmin") <= col("_y")) ||
          (col("_minStrict").isNotNull && col("_minStrict") <= col("_y")) ||
          (col("_minSameX") < col("_y")))
    marked.filter(!col("_dominated"))
      .drop("_x", "_y", "_bkt", "_prevmin", "_minStrict", "_minSameX", "_dominated")
  }
}
