package graft.queriesStreaming

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queriesRelational.RelationalQueries.Q
import graft.streaming.StreamingOps

/** Batch-mode oracle corpus for the streaming operators (B32-B35): the
  * same StreamingOps functions run over the events table as a batch
  * DataFrame; DuckDB replicates the window semantics in SQL
  * (gaps-and-islands for session windows). Streaming execution of the
  * identical code paths is covered by StreamingSpec.
  */
object StreamingQueries {

  /** B32: 1-hour tumbling windows per event_type. Spark's window() is
    * epoch-aligned, so win_start == date_trunc('hour', ts).
    */
  private val q31 = Q("q31_tumbling_window", (s, dir) => {
    StreamingOps.tumblingAgg(Tables.events(s, dir), "ts", "1 hour", col("event_type"))
      .orderBy(col("win_start"), col("event_type"))
  }, Some("""
    SELECT epoch_us(date_trunc('hour', ts)) AS win_start, event_type,
           count(*) AS n,
           CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS value_sum
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type"""))

  /** B32: sliding windows, 2-hour size / 1-hour slide — every event
    * lands in exactly two windows; the oracle unions the two shifted
    * tumbling assignments.
    */
  private val q32 = Q("q32_sliding_window", (s, dir) => {
    StreamingOps.slidingAgg(Tables.events(s, dir), "ts", "2 hours", "1 hour")
      .orderBy(col("win_start"))
  }, Some("""
    SELECT win_start, count(*) AS n FROM (
      SELECT epoch_us(date_trunc('hour', ts)) AS win_start FROM events
      UNION ALL
      SELECT epoch_us(date_trunc('hour', ts) - INTERVAL 1 HOUR) AS win_start FROM events
    ) GROUP BY win_start ORDER BY win_start"""))

  /** B33: per-user session windows with a 4-hour inactivity gap; the
    * oracle derives the same sessions with a gaps-and-islands window
    * construction (new-session flag -> running island id -> group).
    * Spark's session end = last event + gap.
    */
  private val q33 = Q("q33_session_window", (s, dir) => {
    StreamingOps.sessionAgg(Tables.events(s, dir), "ts", "4 hours", "user_id")
      .orderBy(col("user_id"), col("sess_start"))
  }, Some("""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 4 HOUR OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    islands AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged)
    SELECT user_id,
           epoch_us(min(ts)) AS sess_start,
           epoch_us(max(ts) + INTERVAL 4 HOUR) AS sess_end,
           count(*) AS n
    FROM islands GROUP BY user_id, sess_id
    ORDER BY user_id, sess_start"""))

  /** B35: dedup on a key subset (batch form of dropDuplicates; the
    * arbitrary-row-choice nondeterminism is avoided by projecting to
    * the deduped keys only).
    */
  private val q34 = Q("q34_dedup_keys", (s, dir) => {
    StreamingOps.dedup(Tables.events(s, dir).select("user_id", "event_type"),
      Seq("user_id", "event_type"))
      .orderBy(col("user_id"), col("event_type"))
  }, Some("""
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type"""))

  /** Ordered funnel over the events stream-table: signup -> click ->
    * purchase per user, each stage at-or-after the previous one's
    * completion. Chained filtered min-aggs on the user key (stage
    * filters push to the scan; no per-user event collection).
    */
  private val q90 = Q("q90_funnel", (s, dir) => {
    graft.operators.Funnel.orderedFunnel(Tables.events(s, dir),
        col("user_id"), col("ts"), col("event_type"),
        Seq("signup", "click", "purchase"))
      .withColumnRenamed("u", "user_id")
      .orderBy(col("user_id"))
  }, Some("""
    WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type AS y FROM events),
    s1 AS (SELECT u, min(t) AS t1 FROM e WHERE y = 'signup' GROUP BY u),
    s2 AS (SELECT e.u, min(t) AS t2 FROM e JOIN s1 ON e.u = s1.u
           WHERE y = 'click' AND t >= t1 GROUP BY e.u),
    s3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN s2 ON e.u = s2.u
           WHERE y = 'purchase' AND t >= t2 GROUP BY e.u)
    SELECT s1.u AS user_id, t1, s2.t2, s3.t3,
           1 + (CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END)
             + (CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END) AS reached_stage
    FROM s1 LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u
    ORDER BY user_id"""))

  /** Weekly cohort retention over the events table: users bucketed by
    * first-activity week (epoch-day/7 integer buckets — calendar-free),
    * counted per later active week. Min-agg + distinct + equi-join on
    * the user key; no per-user history collection.
    */
  private val q93 = Q("q93_cohort_retention", (s, dir) => {
    graft.operators.Funnel.cohortRetention(Tables.events(s, dir),
        col("user_id"), col("ts"), periodDays = 7)
      .orderBy(col("cohort"), col("period_offset"))
  }, Some("""
    WITH e AS (
      SELECT DISTINCT user_id AS u,
             CAST(floor(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS p
      FROM events),
    cohorts AS (SELECT u, min(p) AS cohort FROM e GROUP BY u)
    SELECT cohorts.cohort, e.p - cohorts.cohort AS period_offset,
           count(DISTINCT e.u) AS n_users
    FROM e JOIN cohorts ON e.u = cohorts.u
    GROUP BY cohorts.cohort, e.p - cohorts.cohort
    ORDER BY cohort, period_offset"""))

  /** Stream-stream interval join (batch form): click -> purchase
    * attribution per user within a [0s, 2h] window after the click.
    * The equi-key (user) is the shuffle key; the interval is a
    * post-join filter. Streaming execution of the identical operator
    * (watermarks both sides, bounded join state) is covered by
    * StreamingSpec.
    */
  private val q98 = Q("q98_interval_join", (s, dir) => {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("purchase_ts"), col("value"))
    StreamingOps.intervalJoin(clicks, purchases, ("cu", "pu"),
        "click_ts", "purchase_ts", "0 seconds", "2 hours")
      .select(col("cu").as("user_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        graft.functions.quantize.q2(col("value")).as("value_r2"))
      .orderBy(col("user_id"), col("click_us"), col("purchase_us"), col("value_r2"))
  }, Some("""
    SELECT c.user_id AS user_id, epoch_us(c.ts) AS click_us,
           epoch_us(p.ts) AS purchase_us,
           floor(p.value*100 + 0.5)/100.0 AS value_r2
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY user_id, click_us, purchase_us, value_r2"""))

  /** Row-level batch sessionization (Funnel.sessionize): every event
    * keeps its (user, session_idx) key — the joinable complement of
    * q33's collapsed session aggregate. 30-minute gap; ties at equal
    * timestamps order by event_id on both engines.
    */
  private val q135 = Q("q135_sessionize", (s, dir) => {
    graft.operators.Funnel.sessionize(
        Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
        col("user_id"), col("ts"), col("event_id"), gapSec = 1800L)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("session_idx"))
      .orderBy(col("event_id"))
  }, Some("""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
    FROM s ORDER BY event_id"""))

  /** Funnel conversion-latency distribution — the question a funnel
    * exists to answer: for users who completed signup->click->purchase
    * (q90's operator), the p50/p90/p99 of end-to-end latency. Values
    * are integer epoch-micros differences and percentiles are
    * rank-select (value at rank floor(p*(n-1))+1 — no interpolation),
    * so both engines agree exactly. The percentile selection is
    * [[graft.operators.Quantiles.exactPercentiles]] — distributed
    * order-bit bucketed rank-select, NO global single-partition rank
    * window: the completed-funnel frame SCALES WITH THE CORPUS (at
    * 100 TB it is millions of rows), so a Window.orderBy over it
    * would be the one unpartitioned sort left in the corpus. Micros
    * are integers < 2^53, exact through the double grid and cast
    * back to long. The funnel itself is q90's user-key-partitioned
    * min-aggregation chain.
    */
  private val q150 = Q("q150_funnel_latency", (s, dir) => {
    val f = graft.operators.Funnel.orderedFunnel(Tables.events(s, dir),
      col("user_id"), col("ts"), col("event_type"),
      Seq("signup", "click", "purchase"))
    val lat = f.filter(col("t3").isNotNull)
      .select((col("t3") - col("t1")).as("lat"))
    val pct = graft.operators.Quantiles.exactPercentiles(lat, lit(1), col("lat"),
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99), interpolate = false)
    pct.select(explode(map(
        lit("p50"), col("p50"), lit("p90"), col("p90"), lit("p99"), col("p99")))
        .as(Seq("p", "_lat")),
      col("n").as("n_completed"))
      .select(col("p"), col("_lat").cast("long").as("latency_us"),
        col("n_completed"))
      .orderBy(col("p"))
  }, Some("""
    WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type AS y FROM events),
    s1 AS (SELECT u, min(t) AS t1 FROM e WHERE y = 'signup' GROUP BY u),
    s2 AS (SELECT e.u, min(t) AS t2 FROM e JOIN s1 ON e.u = s1.u
           WHERE y = 'click' AND t >= t1 GROUP BY e.u),
    s3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN s2 ON e.u = s2.u
           WHERE y = 'purchase' AND t >= t2 GROUP BY e.u),
    compl AS (SELECT s1.u, s3.t3 - s1.t1 AS lat FROM s1 JOIN s3 ON s1.u = s3.u),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM compl),
    r AS (SELECT lat, row_number() OVER (ORDER BY lat) AS rn FROM compl),
    sel AS (
      SELECT 'p50' AS p, lat FROM r CROSS JOIN n
      WHERE rn = CAST(floor(0.5 * CAST(n.n - 1 AS DOUBLE)) AS BIGINT) + 1
      UNION ALL
      SELECT 'p90', lat FROM r CROSS JOIN n
      WHERE rn = CAST(floor(0.9 * CAST(n.n - 1 AS DOUBLE)) AS BIGINT) + 1
      UNION ALL
      SELECT 'p99', lat FROM r CROSS JOIN n
      WHERE rn = CAST(floor(0.99 * CAST(n.n - 1 AS DOUBLE)) AS BIGINT) + 1)
    SELECT sel.p, sel.lat AS latency_us, n.n AS n_completed
    FROM sel CROSS JOIN n ORDER BY p"""))

  /** Rolling 7-day active users (Temporal.rollingDistinct): the
    * sliding COUNT(DISTINCT) no window frame can express, via the
    * contribute-to-7-buckets explode — each event ships (day, user)
    * longs to the 7 days it is visible in, then distinct + count per
    * day. Integer epoch-micros day arithmetic keeps both engines
    * exact.
    */
  private val q156 = Q("q156_rolling_active_users", (s, dir) => {
    graft.operators.Temporal.rollingDistinct(
        Tables.events(s, dir), "ts", "user_id", windowDays = 7)
      .orderBy(col("day"))
  }, Some("""
    WITH e AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d, user_id FROM events),
    k AS (SELECT unnest(range(0, 7)) AS k),
    x AS (SELECT DISTINCT e.d + k.k AS day, user_id FROM e CROSS JOIN k)
    SELECT day, CAST(count(*) AS BIGINT) AS n_active
    FROM x GROUP BY day ORDER BY day"""))

  /** Event-type transition matrix (Temporal.transitionCounts): the
    * Markov-chain view of user behavior — corpus-wide counts and
    * row-normalized probabilities of each consecutive (from, to)
    * event-type pair within a user's timeline. (ts, event_id)
    * ordering pins equal-timestamp sequencing in both engines; the
    * probability rides the micro-unit floor grid.
    */
  private val q163 = Q("q163_event_transitions", (s, dir) => {
    val e = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    graft.operators.Temporal.transitionCounts(e, Seq("user_id"), "ts_us",
        "event_type", tieCols = Seq("event_id"))
      .orderBy(col("from_state"), col("to_state"))
  }, Some("""
    WITH o AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      FROM events),
    c AS (
      SELECT prev AS from_state, event_type AS to_state, CAST(count(*) AS BIGINT) AS n
      FROM o WHERE prev IS NOT NULL GROUP BY prev, event_type)
    SELECT from_state, to_state, n,
           floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_state) * 1000000 + 0.5) / 1000000.0 AS p
    FROM c ORDER BY from_state, to_state"""))

  val list: Seq[Q] = Seq(q31, q32, q33, q34, q90, q93, q98, q135, q150, q156, q163)
}
