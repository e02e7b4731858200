package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-funnel analysis: for each user, the earliest time
  * each stage completed, where stage i counts only at or after stage
  * i-1's completion (signup -> click -> purchase, etc.).
  *
  * Plan shape: one filtered min-aggregation per stage, chained by an
  * equi-join on the user key — NOT a per-user `collect_list` fold.
  * The fold formulation buffers every event of a user in one array
  * (unbounded for power users — the exact skew that kills a 100 TB
  * job); this shape keeps per-user state at one long per stage, every
  * stage filter pushes down to the scan (`y = 'signup'` prunes at the
  * parquet level), and all joins/aggs are hash-partitioned on the
  * user key with map-side combine.
  */
object Funnel {

  /** One row per user that completed stage 1, with epoch-micros
    * completion times t1..tk (null once the funnel stalls) and the
    * reached stage count.
    */
  def orderedFunnel(events: DataFrame, user: Column, ts: Column,
      tpe: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    val e = events.select(user.as("u"), unix_micros(ts).as("_t"), tpe.as("_y"))
    val s1 = e.filter(col("_y") === stages.head)
      .groupBy(col("u")).agg(min(col("_t")).as("t1"))
    val chain = stages.zipWithIndex.drop(1).foldLeft(s1) { case (prev, (stage, i)) =>
      val tPrev = s"t$i"
      val tCur = s"t${i + 1}"
      val next = e.filter(col("_y") === stage)
        .join(prev.select(col("u"), col(tPrev)), "u")
        .filter(col("_t") >= col(tPrev))
        .groupBy(col("u")).agg(min(col("_t")).as(tCur))
      prev.join(next.select(col("u"), col(tCur)), Seq("u"), "left")
    }
    val stageCount = stages.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    chain.withColumn("reached_stage", stageCount.cast("int"))
  }

  /** Cohort retention: users grouped by first-activity period, counted
    * as retained in each later period they were active in. Periods are
    * epoch-day / `periodDays` buckets (integer arithmetic — no
    * calendar ambiguity between engines).
    *
    * Shape: one min-aggregation for cohorts (map-side combined) + one
    * distinct (user, period) projection, equi-joined on the user key,
    * then a count per (cohort, offset) — every shuffle is
    * hash-partitioned on user or (cohort, offset); nothing collects
    * per-user history.
    */
  def cohortRetention(events: DataFrame, user: Column, ts: Column,
      periodDays: Int = 7): DataFrame = {
    val period = floor(unix_date(to_date(ts)) / periodDays).cast("long")
    val e = events.select(user.as("u"), period.as("_p"))
    // cohorts derive from the DISTINCT (user, period) frame — min over
    // distinct periods equals min over raw events, at a fraction of
    // the aggregated volume. After the join each user contributes at
    // most one row per (cohort, offset), so a plain count suffices
    // (countDistinct would add an expand + second aggregate phase).
    val active = e.distinct()
    val cohorts = active.groupBy(col("u")).agg(min(col("_p")).as("cohort"))
    active.join(cohorts, "u")
      .groupBy(col("cohort"), (col("_p") - col("cohort")).as("period_offset"))
      .agg(count(col("u")).as("n_users"))
  }

  /** BATCH sessionization (gaps-and-islands): assign each event its
    * 1-based session index per user — a new session starts when the
    * gap to the previous event exceeds `gapSec`. The row-level
    * complement of the session_window AGGREGATE (q33): downstream
    * joins get a (user, session_idx) key per event instead of one
    * collapsed row per session.
    *
    * One shuffle on the user key; per-user windows (lag + running
    * sum) ordered by (ts, tieBreak) so concurrent events order
    * deterministically. Gap compares integer epoch microseconds —
    * no floating time arithmetic (q135).
    */
  def sessionize(events: DataFrame, user: Column, ts: Column,
      tieBreak: Column, gapSec: Long): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val w = Window.partitionBy(col("_sz_u")).orderBy(col("_sz_t"), col("_sz_tb"))
    val newSession = when(lag(col("_sz_t"), 1).over(w).isNull ||
      unix_micros(col("_sz_t")) - unix_micros(lag(col("_sz_t"), 1).over(w)) >
        gapSec * 1000000L, 1L).otherwise(0L)
    // two projections: the running sum must see _sz_new as a column,
    // not a nested window expression
    events.withColumn("_sz_u", user).withColumn("_sz_t", ts)
      .withColumn("_sz_tb", tieBreak)
      .withColumn("_sz_new", newSession)
      .withColumn("session_idx", sum(col("_sz_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_sz_u", "_sz_t", "_sz_tb", "_sz_new")
  }
}
