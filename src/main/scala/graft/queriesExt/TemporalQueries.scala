package graft.queriesExt

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Temporal
import graft.queriesRelational.RelationalQueries.Q

/** Time-series regularization and scoring over the events table:
  * gap-fill/forward-fill onto a fixed grid, dyadic-decay trend
  * scores, integer rolling-z anomaly detection, time-weighted
  * averages. Every operator rides integer grids (cents, epoch
  * seconds, micro quotients) so DuckDB replays each result
  * bit-for-bit.
  */
object TemporalQueries {

  /** events projected to the integer-cents grain every temporal
    * operator consumes: (user_id, event_id, ts_us, cents).
    */
  private def cents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))

  private val centsSql = """
    e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events)"""

  /** Gap-fill (Temporal.gapFill): every user's event values bucketed
    * to days and forward-filled across a dense per-user day spine —
    * the resample step that turns an irregular event stream into the
    * one-row-per-key-per-period table rolling metrics assume. The
    * oracle rebuilds the spine with generate_series and fills gaps
    * with the running-count group trick (pure ANSI, no IGNORE NULLS
    * needed), so the hash match proves bucketing, last-sample-wins,
    * spine bounds, and fill all agree.
    */
  private val q170 = Q("q170_gap_fill", (s, dir) => {
    Temporal.gapFill(cents(s, dir), "user_id", tsUsCol = "ts_us",
        valCol = "cents", tieCol = "event_id", stepMicros = 86400000000L)
      .orderBy(col("user_id"), col("bucket"))
  }, Some(s"""
    WITH $centsSql,
    b AS (
      SELECT user_id, ts_us // 86400000000 AS bucket, ts_us, event_id, cents
      FROM e),
    lastv AS (
      SELECT user_id, bucket, cents FROM (
        SELECT user_id, bucket, cents,
               row_number() OVER (PARTITION BY user_id, bucket
                                  ORDER BY ts_us DESC, event_id DESC) AS rn
        FROM b) WHERE rn = 1),
    span AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      FROM b GROUP BY user_id),
    spine AS (
      SELECT user_id, unnest(generate_series(b0, b1)) AS bucket FROM span),
    j AS (
      SELECT s.user_id, s.bucket, l.cents
      FROM spine s LEFT JOIN lastv l USING (user_id, bucket)),
    g AS (
      SELECT user_id, bucket, cents,
             count(cents) OVER (PARTITION BY user_id ORDER BY bucket) AS grp
      FROM j)
    SELECT user_id, bucket,
           max(cents) OVER (PARTITION BY user_id, grp) AS filled,
           CAST(CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
    FROM g ORDER BY user_id, bucket"""))

  private val lagCap = 16

  /** Dyadic-decay trend score (Temporal.dyadicDecayScore): per event,
    * the half-life-one-step exponentially weighted value of the
    * user's last 17 samples as EXACT integer arithmetic — weight
    * 2^(16-d) at lag d, score = (num * 1e6) div den. The oracle
    * unrolls the same 17 lag terms; integer division on both sides
    * makes the quotient grid engine-exact.
    */
  private val q171 = Q("q171_decay_score", (s, dir) => {
    Temporal.dyadicDecayScore(cents(s, dir), "user_id", "ts_us", "cents",
        "event_id", lagCap = lagCap)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("cents"),
        col("num"), col("den"), col("score_micro"))
      .orderBy(col("user_id"), col("event_id"))
  }, {
    val numTerms = (0 to lagCap).map { d =>
      val w = 1L << (lagCap - d)
      if (d == 0) s"cents * $w"
      else s"CASE WHEN l_$d IS NOT NULL THEN l_$d * $w ELSE 0 END"
    }.mkString(" + ")
    val denTerms = (0 to lagCap).map { d =>
      val w = 1L << (lagCap - d)
      if (d == 0) s"$w"
      else s"CASE WHEN l_$d IS NOT NULL THEN $w ELSE 0 END"
    }.mkString(" + ")
    val lagCols = (1 to lagCap).map(d => s"lag(cents, $d) OVER w AS l_$d").mkString(", ")
    Some(s"""
    WITH $centsSql,
    t AS (
      SELECT user_id, event_id, ts_us, cents, $lagCols
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    x AS (
      SELECT user_id, event_id, ts_us, cents,
             CAST($numTerms AS BIGINT) AS num,
             CAST($denTerms AS BIGINT) AS den
      FROM t)
    SELECT user_id, event_id, ts_us, cents, num, den,
           (num * 1000000) // den AS score_micro
    FROM x ORDER BY user_id, event_id""")
  })

  /** Rolling-z anomaly detection (Temporal.rollingAnomalies): events
    * whose value deviates > 3 sigma from the mean of the user's 20
    * preceding samples, tested entirely in integers via
    * (n*x - sum)^2 > k^2 (n*sumsq - sum^2) — no division, no sqrt,
    * no float. Flags 235 of 7000 scored rows at sf0.01: the events
    * value column is heavy-tailed, so the test is selective without
    * being vacuous.
    */
  private val q172 = Q("q172_rolling_anomaly", (s, dir) => {
    Temporal.rollingAnomalies(cents(s, dir), "user_id", "ts_us", "cents",
        "event_id", n = 20, k = 3)
      .orderBy(col("user_id"), col("event_id"))
  }, Some(s"""
    WITH $centsSql,
    t AS (
      SELECT user_id, event_id, ts_us, cents,
             count(cents) OVER w AS cnt,
             CAST(sum(cents) OVER w AS BIGINT) AS s,
             CAST(sum(cents * cents) OVER w AS BIGINT) AS ssq
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT user_id, event_id, ts_us, cents,
           CAST((20 * cents - s) * (20 * cents - s) AS BIGINT) AS dev2,
           CAST(20 * ssq - s * s AS BIGINT) AS nvar
    FROM t
    WHERE cnt = 20
      AND (20 * cents - s) * (20 * cents - s) > 9 * (20 * ssq - s * s)
    ORDER BY user_id, event_id"""))

  /** Time-weighted average (Temporal.timeWeightedAvg): each user's
    * zero-order-hold mean value — every sample weighted by how long
    * it held (integer seconds), the correct mean for bursty series.
    * num/den are exact integer sums; twa is one IEEE division +
    * floor onto the micro grid.
    */
  private val q173 = Q("q173_time_weighted_avg", (s, dir) => {
    Temporal.timeWeightedAvg(cents(s, dir), "user_id", "ts_us", "cents",
        "event_id")
      .orderBy(col("user_id"))
  }, Some(s"""
    WITH $centsSql,
    t AS (
      SELECT user_id, cents, ts_us,
             lead(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS next_us
      FROM e),
    d AS (
      SELECT user_id, cents, (next_us - ts_us) // 1000000 AS dur
      FROM t WHERE next_us IS NOT NULL)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(cents * dur) AS BIGINT) AS num,
           CAST(sum(dur) AS BIGINT) AS den,
           CASE WHEN sum(dur) > 0
                THEN floor(CAST(sum(cents * dur) AS DOUBLE) / sum(dur) * 1000000)
                     / 1000000.0 END AS twa
    FROM d GROUP BY user_id ORDER BY user_id"""))

  /** Per-user OLS trend (Temporal.linearTrend): the least-squares
    * slope of value-cents against seconds-since-first-sample, one
    * row per user — the drift screen. num/den are exact integer
    * moment combinations; slope_micro is one cast-divide-floor,
    * engine-identical.
    */
  private val q181 = Q("q181_linear_trend", (s, dir) => {
    Temporal.linearTrend(cents(s, dir), "user_id", "ts_us", "cents")
      .orderBy(col("user_id"))
  }, Some(s"""
    WITH $centsSql,
    x AS (
      SELECT user_id,
             (ts_us - min(ts_us) OVER (PARTITION BY user_id)) // 1000000 AS x,
             cents AS y
      FROM e),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
      FROM x GROUP BY user_id)
    SELECT user_id, n AS n_samples,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den,
           CASE WHEN n * sxx - sx * sx > 0 THEN
             floor(CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000) / 1000000.0
           END AS slope_micro
    FROM m ORDER BY user_id"""))

  /** Metric correlation matrix (Temporal.correlationMatrix): Pearson
    * r between every pair of event-type DAILY-value series, aligned
    * on day buckets by one self-join — no wide pivot. Integer moment
    * sums; r_micro = num / sqrt(dx*dy) in IEEE doubles floored onto
    * the micro grid.
    */
  private val q182 = Q("q182_correlation_matrix", (s, dir) => {
    val daily = Tables.events(s, dir).select(
        col("event_type"),
        expr("unix_micros(ts) div 86400000000L").as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("v"))
    Temporal.correlationMatrix(daily, "event_type", "day", "v")
      .orderBy(col("series_a"), col("series_b"))
  }, Some("""
    WITH e AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    d AS (SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS v
          FROM e GROUP BY 1, 2),
    p AS (SELECT a.event_type AS series_a, b.event_type AS series_b,
                 a.v AS x, b.v AS y
          FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type),
    m AS (SELECT series_a, series_b, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM p GROUP BY 1, 2)
    SELECT series_a, series_b, n AS n_buckets,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS dx,
           CAST(n * syy - sy * sy AS BIGINT) AS dy,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             floor(CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000) / 1000000.0
           END AS r_micro
    FROM m ORDER BY series_a, series_b"""))

  /** Interval-overlap sweep line (Temporal.concurrency): click events
    * become [ts, ts + value hours) usage intervals pooled into 50
    * groups; the result is each group's full concurrency step
    * function. The oracle restates the sweep as delta rows collapsed
    * per timestamp + a running sum — a wrong boundary order, a
    * leaked zero-length interval, or peer-frame disagreement all
    * surface as hash mismatches.
    */
  private val q188 = Q("q188_interval_concurrency", (s, dir) => {
    val iv = Tables.events(s, dir)
      .where(col("event_type") === "click")
      .select((col("user_id") % 50).as("k"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) +
          floor(col("value") * 3600000000L + lit(0.5)).cast("long")).as("e_us"))
    Temporal.concurrency(iv, "k", "s_us", "e_us")
      .orderBy(col("k"), col("ts_us"))
  }, Some("""
    WITH iv AS (
      SELECT user_id % 50 AS k, epoch_us(ts) AS s_us,
             epoch_us(ts) + CAST(floor(value * 3600000000 + 0.5) AS BIGINT) AS e_us
      FROM events WHERE event_type = 'click'),
    d AS (
      SELECT k, s_us AS ts_us, CAST(1 AS BIGINT) AS dd FROM iv
      UNION ALL
      SELECT k, e_us, CAST(-1 AS BIGINT) FROM iv),
    g AS (SELECT k, ts_us, CAST(SUM(dd) AS BIGINT) AS dd FROM d GROUP BY k, ts_us)
    SELECT k, ts_us,
           CAST(SUM(dd) OVER (PARTITION BY k ORDER BY ts_us) AS BIGINT) AS active
    FROM g ORDER BY k, ts_us"""))

  /** Point-in-time join (Temporal.pitJoin): every purchase event
    * joined to the user's state — the SCD2 history of their
    * NON-purchase activity — as of the purchase time. The leak-proof
    * feature join: a purchase before the user's first tracked state
    * surfaces with nulls, never with a later version. The oracle is
    * the interval-containment LEFT JOIN over the same q162-style
    * history CTEs, so the hash match proves the single-shuffle
    * union-tag plan equals the declarative interval join row for
    * row (match, gap, and never-seen cases included).
    */
  private val q193 = Q("q193_pit_join", (s, dir) => {
    import graft.operators.ChangeCapture
    val e = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val hist = ChangeCapture.scd2(e.where(col("event_type") =!= "purchase"),
      keyCols = Seq("user_id"), tsCol = "ts_us",
      attrCols = Seq("event_type"), tieCols = Seq("event_id"))
    val facts = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    Temporal.pitJoin(facts, hist, Seq("user_id"), "ts_us", Seq("event_type"))
      .orderBy(col("event_id"))
  }, Some("""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
    ne AS (SELECT * FROM e WHERE event_type <> 'purchase'),
    o AS (
      SELECT user_id, event_type, ts_us, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      FROM ne),
    c AS (
      SELECT user_id, event_type, ts_us, event_id FROM o
      WHERE prev IS NULL OR prev <> event_type),
    h AS (
      SELECT user_id, event_type, ts_us AS valid_from,
             lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to
      FROM c),
    f AS (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'purchase')
    SELECT f.user_id, f.event_id, f.ts_us, h.event_type,
           h.valid_from AS asof_valid_from
    FROM f LEFT JOIN h
      ON h.user_id = f.user_id AND h.valid_from <= f.ts_us
     AND (h.valid_to IS NULL OR f.ts_us < h.valid_to)
    ORDER BY f.event_id"""))

  /** Seasonal decomposition (Temporal.seasonalDecompose): every
    * event value split into its user's day-of-week mean component
    * and the de-seasonalized residual, all on the integer micro
    * grid. The oracle replays the bucket-mean windows with explicit
    * BIGINT casts (DuckDB window SUMs are HUGEINT) — a wrong period
    * position, a mean off by a floor, or a residual sign slip all
    * break the hash.
    */
  private val q195 = Q("q195_seasonal_decompose", (s, dir) => {
    Temporal.seasonalDecompose(cents(s, dir), "user_id", "ts_us", "cents")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("cents"),
        col("period_pos"), col("seasonal_micro"), col("residual_micro"))
      .orderBy(col("event_id"))
  }, Some(s"""
    WITH $centsSql,
    s AS (SELECT user_id, event_id, ts_us, cents,
                 (ts_us // 86400000000) % 7 AS period_pos
          FROM e),
    m AS (SELECT *,
            (CAST(sum(cents) OVER (PARTITION BY user_id, period_pos) AS BIGINT) * 1000000)
              // CAST(count(*) OVER (PARTITION BY user_id, period_pos) AS BIGINT) AS seasonal_micro
          FROM s)
    SELECT user_id, event_id, ts_us, cents, period_pos, seasonal_micro,
           cents * 1000000 - seasonal_micro AS residual_micro
    FROM m ORDER BY event_id"""))

  /** CUSUM changepoint screen (Temporal.cusumChangepoint): per user,
    * where the cumulative deviation from their mean spend peaks —
    * the level-shift locator. Exact longs throughout; the oracle
    * replays running sums and the (|cusum| desc, ts, id) argmax.
    */
  private val q196 = Q("q196_cusum_changepoint", (s, dir) => {
    Temporal.cusumChangepoint(cents(s, dir), "user_id", "ts_us", "cents",
        tieCol = "event_id")
      .orderBy(col("user_id"))
  }, Some(s"""
    WITH $centsSql,
    k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                 (CAST(sum(cents) AS BIGINT) * 1000000)
                   // CAST(count(*) AS BIGINT) AS mean_u
          FROM e GROUP BY user_id),
    r AS (SELECT user_id, ts_us, event_id,
                 CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum,
                 CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rn
          FROM e),
    c AS (SELECT r.user_id, r.ts_us, r.event_id,
                 r.rsum * 1000000 - r.rn * k.mean_u AS cu
          FROM r JOIN k USING (user_id)),
    p AS (SELECT user_id, ts_us, cu,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY abs(cu) DESC, ts_us, event_id) AS rk
          FROM c)
    SELECT p.user_id, k.n, p.ts_us AS peak_ts_us,
           CAST(p.cu AS BIGINT) AS peak_cusum_micro
    FROM p JOIN k USING (user_id)
    WHERE p.rk = 1 ORDER BY p.user_id"""))

  /** Debounce (Temporal.debounce): events of the same (user, type)
    * arriving within 6 hours of their predecessor drop out — the
    * jitter-tolerant dedup exact hashing can't do. The oracle is the
    * same lag definition in SQL.
    */
  private val q197 = Q("q197_debounce", (s, dir) => {
    Temporal.debounce(cents(s, dir)
        .join(Tables.events(s, dir).select(col("event_id"), col("event_type")), "event_id"),
      keyCols = Seq("user_id", "event_type"), tsUsCol = "ts_us",
      tieCol = "event_id", gapMicros = 21600000000L)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))
      .orderBy(col("event_id"))
  }, Some(s"""
    WITH $centsSql,
    x AS (SELECT e.user_id, ev.event_type, e.event_id, e.ts_us,
                 lag(e.ts_us) OVER (PARTITION BY e.user_id, ev.event_type
                                    ORDER BY e.ts_us, e.event_id) AS prev_ts
          FROM e JOIN events ev ON ev.event_id = e.event_id)
    SELECT user_id, event_type, event_id, ts_us
    FROM x WHERE prev_ts IS NULL OR ts_us - prev_ts >= 21600000000
    ORDER BY event_id"""))

  val list: Seq[Q] = Seq(q170, q171, q172, q173, q181, q182, q188, q193,
    q195, q196, q197)
}
