package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins. The as-of join was born inline in q64; this is the
  * reusable operator form with the pandas-merge_asof / kdb-aj feature
  * set: per left row, the most recent right row at-or-before it on the
  * same key, optionally only within a tolerance window.
  *
  * Composition (SURVEY §4 preference (a), no custom plan node):
  * union-tag both sides, one running `last(..., ignoreNulls)` window
  * per key — ONE shuffle on the key, linear in total rows. The
  * range-join formulation this replaces explodes quadratically inside
  * hot keys (every purchase x every earlier click of the same user).
  *
  * Determinism contract: the window orders by (ts, side, tieBreak) —
  * right rows sort BEFORE left rows at equal timestamps (an exactly
  * concurrent right row matches), and ties among right rows break on
  * `tieBreak` (pass the unique event id). Tolerance compares integer
  * epoch microseconds — no floating time arithmetic.
  */
object Temporal {

  /** @param tieBreak   column name present in BOTH frames (unique id)
    * @param toleranceSec match only if the signed time gap (left-right
    *        for backward, right-left for forward) is <= this
    * @param direction  "backward" (default): most recent right row
    *        at-or-BEFORE each left row — pandas merge_asof's default;
    *        "forward": earliest right row at-or-AFTER — the
    *        "next event" lookup (purchase -> next support contact).
    *        Forward is the same one-shuffle window composition run
    *        over the mirrored ordering (ts DESC, right-before-left at
    *        ties, tieBreak DESC so ties resolve to the SMALLEST right
    *        id — the mirror image of backward's largest-id rule).
    * @return left rows (original columns) + `asof`: the matched right
    *         row as a struct, null when nothing matched (or nothing
    *         within tolerance)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyL: String, keyR: String,
      tsL: String, tsR: String, tieBreak: String,
      toleranceSec: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val reserved = Seq("_k", "_t", "_tb", "_side", "_lrow", "_rrow", "_m", "asof")
    val clashes = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(clashes.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename the input columns ${clashes.mkString(", ")} first")
    require(left.columns.contains(tieBreak) && right.columns.contains(tieBreak),
      s"tieBreak column '$tieBreak' must exist in BOTH frames " +
        s"(left has: ${left.columns.mkString(", ")}; right has: ${right.columns.mkString(", ")})")
    val l = left.select(col(keyL).as("_k"), col(tsL).as("_t"),
      col(tieBreak).as("_tb"), lit(1).as("_side"),
      struct(left.columns.map(col): _*).as("_lrow"))
    val r = right.select(col(keyR).as("_k"), col(tsR).as("_t"),
      col(tieBreak).as("_tb"), lit(0).as("_side"),
      struct(right.columns.map(col): _*).as("_rrow"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = (if (direction == "backward")
        Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"), col("_tb"))
      else
        Window.partitionBy(col("_k")).orderBy(col("_t").desc, col("_side"), col("_tb").desc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val gated = toleranceSec match {
      case Some(tol) =>
        val gap =
          if (direction == "backward")
            unix_micros(col("_t")) - unix_micros(col("_m").getField(tsR))
          else
            unix_micros(col("_m").getField(tsR)) - unix_micros(col("_t"))
        matched.withColumn("_m",
          when(col("_m").isNotNull && gap <= tol * 1000000L, col("_m")))
      case None => matched
    }
    gated.select((left.columns.map(c => col(s"_lrow.`$c`")) :+ col("_m").as("asof")): _*)
  }

  /** Rolling `windowDays`-day DISTINCT count per day — the metric
    * Spark's window functions cannot express (COUNT(DISTINCT) OVER a
    * sliding frame is unsupported) and the naive per-day self-join
    * makes quadratic. The scalable idiom: each event CONTRIBUTES its
    * key to the `windowDays` day-buckets it is visible in (a
    * sequence+explode of (day, key) longs — w-fold row multiplication
    * of two longs, never payloads), then distinct + count per day.
    * One shuffle on (day, key), map-side combined count — at 100 TB
    * this is the 7/28-day-active-users job, and the explode shape is
    * exactly how production DAU/WAU/MAU pipelines shard it. Day
    * arithmetic rides integer epoch-micros division, exact on any
    * engine. Output: (day, n_active) for every day any key is
    * visible (the trailing windowDays-1 days carry partial windows —
    * callers clamp to the observed range when reporting).
    */
  def rollingDistinct(df: DataFrame, tsCol: String, keyCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val day = floor(unix_micros(col(tsCol)) / lit(86400000000L)).cast("long")
    df.select(day.as("_d"), col(keyCol).as("_k"))
      .select(explode(sequence(col("_d"), col("_d") + (windowDays - 1))).as("day"),
        col("_k"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n_active"))
  }

  /** Gap-fill / resample: bucket each key's samples onto a fixed
    * `stepMicros` grid, emit a DENSE per-key spine from its first to
    * its last bucket, and forward-fill the last observed value across
    * the gaps — the time-series regularization every downstream
    * rolling computation assumes ("one row per sensor per hour, gaps
    * carried forward"). No window function can conjure the missing
    * rows; the scalable idiom is spine-generation + fill:
    *
    *  1. per (key, bucket): the LAST sample wins — max of the
    *     (ts, tie, value) struct, deterministic because `tieCol` is
    *     unique (one map-side-combined aggregation);
    *  2. per key: min/max bucket (rides the same shuffle);
    *  3. spine = sequence(min, max) exploded — row growth is
    *     span/step per key, two longs wide, never payloads;
    *  4. one running `last(ignoreNulls)` window per key fills gaps.
    *
    * Everything shuffles ONCE on the key (the agg and the window
    * share the partitioning); bucket arithmetic is integer epoch-
    * micros division, exact on any engine. Output: (key, bucket,
    * filled, is_gap 0/1) — `filled` is the forward-filled value
    * (null before a key's first sample only never happens: the spine
    * starts AT the first sample's bucket). `tsUsCol` is integer
    * epoch MICROS (callers convert timestamps via unix_micros, the
    * house convention).
    *
    * 100 TB note: spine width is bounded by observed span/step per
    * key, so a sparse key costs its span, not the global range; keys
    * fill independently — no global sort, no driver state.
    */
  def gapFill(df: DataFrame, keyCol: String, tsUsCol: String, valCol: String,
      tieCol: String, stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"stepMicros must be positive, got $stepMicros")
    val reserved = Seq("key", "bucket", "filled", "is_gap", "_s", "_v", "_b0", "_b1")
    val clashes = Seq(keyCol).filter(reserved.contains)
    require(clashes.isEmpty, s"gapFill reserves ${reserved.mkString(", ")}")
    val bucket = expr(s"`$tsUsCol` div ${stepMicros}L")
    val bucketed = df
      .select(col(keyCol).as("key"), bucket.as("bucket"),
        struct(col(tsUsCol).as("_t"), col(tieCol).as("_tb"),
          col(valCol).as("_v")).as("_s"))
      .groupBy(col("key"), col("bucket"))
      .agg(max(col("_s")).getField("_v").as("_v"))
    val spine = bucketed.groupBy(col("key"))
      .agg(min(col("bucket")).as("_b0"), max(col("bucket")).as("_b1"))
      .select(col("key"), explode(sequence(col("_b0"), col("_b1"))).as("bucket"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(bucketed, Seq("key", "bucket"), "left")
      .select(col("key").as(keyCol), col("bucket"),
        last(col("_v"), ignoreNulls = true).over(w).as("filled"),
        when(col("_v").isNull, 1L).otherwise(0L).as("is_gap"))
  }

  /** Exponential-decay rolling score with DYADIC decay (half-life =
    * one step) truncated at `lagCap` lags — the trend/recency score
    * ("how hot is this key right now") as exact integer arithmetic.
    * Lag d contributes weight 2^(lagCap-d), so the weighted sum and
    * the weight sum are plain longs and the normalized score is ONE
    * integer division onto the micro grid — every engine replays it
    * bit-for-bit, unlike pow(alpha, n) chains whose float error
    * accumulates. Truncation at lagCap discards < 2^-lagCap of the
    * mass (documented, not hidden).
    *
    * One shuffle on the key; the unrolled lag sum is a single window
    * pass (lagCap+1 codegen'd lag() terms, no self-join — the
    * self-join formulation multiplies rows by lagCap at 100 TB).
    * Ordering within a key is (tsCol, tieCol) — pass a unique id.
    *
    * Output: input keys + (ts ordinal columns) + num/den/score_micro
    * where score_micro = (num * 1e6) div den.
    */
  def dyadicDecayScore(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, lagCap: Int = 16): DataFrame = {
    require(lagCap >= 1 && lagCap <= 40,
      s"lagCap must be in [1, 40] (weights are 2^lagCap longs), got $lagCap")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val terms = (0 to lagCap).map { d =>
      val weight = 1L << (lagCap - d)
      val lagged = if (d == 0) col(valCol) else lag(col(valCol), d).over(w)
      (when(lagged.isNotNull, lagged * lit(weight)).otherwise(lit(0L)),
        when(lagged.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn("num", num).withColumn("den", den)
      .withColumn("score_micro", expr("(num * 1000000L) div den"))
  }

  /** Rolling z-score anomaly detection, ALL-INTEGER: flag a sample
    * whose deviation from the mean of its `n` PRECEDING samples
    * exceeds `k` sigma. The textbook test compares floats
    * ((x-m)/s > k); cross-multiplying removes every division and
    * square root:
    *
    *   (n*x - sum)^2  >  k^2 * (n*sumsq - sum^2)
    *
    * so the whole detector is three windowed integer sums and two
    * integer multiplies — deterministic on any engine, and the window
    * is ONE pass over each key (frame [-n, -1], current row
    * excluded so the anomaly cannot mask itself). Rows with fewer
    * than n predecessors are not scored (cnt = n gate). Returns the
    * FLAGGED rows with their integer evidence (dev2, nvar).
    *
    * Caller contract: valCol is integer-scaled (e.g. cents) with
    * |v| <= ~2e9/n so n*sumsq stays inside a long.
    */
  def rollingAnomalies(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, n: Int = 20, k: Int = 3): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-n, -1)
    val x = col(valCol)
    df.withColumn("_cnt", count(x).over(w))
      .withColumn("_sum", sum(x).over(w))
      .withColumn("_ssq", sum(x * x).over(w))
      .where(col("_cnt") === n)
      .withColumn("dev2",
        (lit(n) * x - col("_sum")) * (lit(n) * x - col("_sum")))
      .withColumn("nvar", lit(n) * col("_ssq") - col("_sum") * col("_sum"))
      .where(col("dev2") > lit(k.toLong * k) * col("nvar"))
      .drop("_cnt", "_sum", "_ssq")
  }

  /** Time-weighted average per key over irregular samples: each
    * sample holds until the next one (zero-order hold), so the mean
    * weights each value by its holding duration — the correct average
    * for sensor/price series where sampling is bursty (an arithmetic
    * mean over-counts the bursts). num/den are exact integer
    * (value x seconds) sums; the ratio is one IEEE division + floor
    * onto the micro grid (num, den < 2^53), engine-reproducible. The
    * last sample of each key has no successor and contributes no
    * interval (standard TWAP convention). One shuffle on the key
    * (the lead window), one map-side-combined aggregation. `tsUsCol`
    * is integer epoch micros, the house convention.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsUsCol: String,
      valCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tieCol))
    df.withColumn("_ts_us", col(tsUsCol))
      .withColumn("_next_us", lead(col("_ts_us"), 1).over(w))
      .where(col("_next_us").isNotNull)
      .withColumn("_dur", expr("(_next_us - _ts_us) div 1000000L"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col(valCol) * col("_dur")).as("num"),
        sum(col("_dur")).as("den"))
      .withColumn("twa",
        when(col("den") > 0,
          floor(col("num").cast("double") / col("den") * 1e6) / 1e6))
  }

  /** Per-key OLS trend: the least-squares slope of value against
    * time for every key — the "which sensors/accounts are drifting
    * up" screen, one number per key instead of a model fit. The
    * moment sums ride exact integers (x = seconds since the KEY'S
    * first sample — re-zeroing per key keeps magnitudes small and is
    * slope-invariant; y = the caller's integer grid):
    *
    *   slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
    *
    * num/den are exact longs; slope_micro is one long→double cast
    * per side + IEEE divide + floor onto the micro grid — identical
    * on any engine (casts and correctly-rounded ops, no
    * order-dependent float summation anywhere). Keys with zero time
    * spread (den = 0) report null slope.
    *
    * One shuffle on the key: the min-window and the moment
    * aggregation share the same hash partitioning.
    */
  def linearTrend(df: DataFrame, keyCol: String, tsUsCol: String,
      valCol: String): DataFrame = {
    val wk = Window.partitionBy(col(keyCol))
    val x = expr(s"(`$tsUsCol` - _t0) div 1000000L")
    df.withColumn("_t0", min(col(tsUsCol)).over(wk))
      .select(col(keyCol), x.as("_x"), col(valCol).as("_y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"))
      .select(col(keyCol), col("n_samples"),
        (col("n_samples") * col("_sxy") - col("_sx") * col("_sy")).as("num"),
        (col("n_samples") * col("_sxx") - col("_sx") * col("_sx")).as("den"))
      .withColumn("slope_micro",
        when(col("den") > 0,
          floor(col("num").cast("double") / col("den").cast("double") * 1e6) / 1e6))
  }

  /** Pairwise Pearson correlation between named metric SERIES — the
    * metric-correlation matrix ("which KPIs move together") computed
    * without ever pivoting to a wide table: series are (series,
    * bucket, value) rows, pairs align on bucket via one self-join
    * (output and join fan-out are both |series|²-bounded — the
    * series DIMENSION is small even when each series has billions of
    * points, and the per-bucket aggregation that feeds this has
    * already reduced those points). Only buckets present in BOTH
    * series count (inner join = pairwise-complete observations).
    *
    * Moment sums are exact integers; r = num / sqrt(dx·dy) is
    * evaluated in doubles (casts + one multiply + sqrt + divide —
    * every step IEEE-exact-rounded, so engines agree) and floored
    * onto the micro grid. Degenerate pairs (zero variance on either
    * side) report null r.
    */
  def correlationMatrix(series: DataFrame, seriesCol: String,
      bucketCol: String, valCol: String): DataFrame = {
    val a = series.select(col(seriesCol).as("series_a"),
      col(bucketCol).as("_b"), col(valCol).as("_x"))
    val b = series.select(col(seriesCol).as("series_b"),
      col(bucketCol).as("_b"), col(valCol).as("_y"))
    a.join(b, "_b").where(col("series_a") < col("series_b"))
      .groupBy(col("series_a"), col("series_b"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
      .select(col("series_a"), col("series_b"), col("n_buckets"),
        (col("n_buckets") * col("_sxy") - col("_sx") * col("_sy")).as("num"),
        (col("n_buckets") * col("_sxx") - col("_sx") * col("_sx")).as("dx"),
        (col("n_buckets") * col("_syy") - col("_sy") * col("_sy")).as("dy"))
      .withColumn("r_micro",
        when(col("dx") > 0 && col("dy") > 0,
          floor(col("num").cast("double")
            / sqrt(col("dx").cast("double") * col("dy").cast("double")) * 1e6) / 1e6))
  }

  /** Point-in-time (PIT) join — the feature-store correctness
    * staple: join each fact row to the dimension version that was
    * VALID AT THE FACT'S TIME, i.e. the [[graft.operators
    * .ChangeCapture.scd2]] history row with valid_from <= ts <
    * valid_to. Training joins that use today's dimension instead of
    * the as-of version leak the future into features; this operator
    * is the leak-proof form.
    *
    * Same union-tag single-shuffle engine as [[asofJoin]] (the
    * interval containment never becomes a range join): history rows
    * enter the per-key timeline at `valid_from`, facts ride after
    * them at equal timestamps (side ordering — a version starting
    * exactly at the fact's ts applies), one running
    * `last(ignoreNulls)` window carries the version, and the
    * `valid_to` gate nulls out facts that fall in a HISTORY GAP
    * (e.g. tombstoned keys) rather than leaking the stale version.
    * Output: every fact row (left join semantics) + the attr columns
    * as-of the fact time + `asof_valid_from` (the matched version's
    * start, null when unmatched) — nulls for never-seen keys and
    * gap hits alike.
    *
    * Contract: `factTsCol` and `validFromCol`/`validToCol` share one
    * orderable grid (the scd2 tsCol's); history intervals per key
    * are disjoint (scd2 output). One shuffle on the key, linear in
    * |facts| + |history|.
    */
  def pitJoin(facts: DataFrame, history: DataFrame, keyCols: Seq[String],
      factTsCol: String, attrCols: Seq[String],
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "keyCols and attrCols must be non-empty")
    val reserved = Seq("_pts", "_pside", "_pdim", "_pfact", "_pm", "asof_valid_from")
    val clashes = (facts.columns ++ history.columns).filter(reserved.contains).distinct
    require(clashes.isEmpty,
      s"pitJoin reserves ${reserved.mkString(", ")}; rename ${clashes.mkString(", ")} first")
    val attrClash = attrCols.filter(facts.columns.contains)
    require(attrClash.isEmpty,
      s"attr columns ${attrClash.mkString(", ")} already exist in facts — " +
        "rename one side to keep the output schema unambiguous")
    val h = history.select(keyCols.map(col) ++ Seq(
      col(validFromCol).as("_pts"), lit(0).as("_pside"),
      struct(attrCols.map(col) ++ Seq(col(validToCol).as("_pvto"),
        col(validFromCol).as("_pvf")): _*).as("_pdim")): _*)
    val f = facts.select(keyCols.map(col) ++ Seq(
      col(factTsCol).as("_pts"), lit(1).as("_pside"),
      struct(facts.columns.map(col): _*).as("_pfact")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_pts"), col("_pside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = h.unionByName(f, allowMissingColumns = true)
      .withColumn("_pm", last(col("_pdim"), ignoreNulls = true).over(w))
      .filter(col("_pside") === 1)
      .withColumn("_pm", when(col("_pm").isNotNull &&
        (col("_pm.`_pvto`").isNull || col("_pts") < col("_pm.`_pvto`")),
        col("_pm")))
    joined.select(facts.columns.map(c => col(s"_pfact.`$c`")) ++
      attrCols.map(c => col(s"_pm.`$c`").as(c)) :+
      col("_pm.`_pvf`").as("asof_valid_from"): _*)
  }

  /** Interval-overlap sweep line: from (key, start, end) intervals,
    * the step function of CONCURRENT interval counts per key — "how
    * many sessions/jobs/calls were active at each moment", the query
    * behind peak-load sizing, connection-pool audits, and overlap
    * billing. Output: one row per (key, boundary timestamp) with
    * `active` = the count in force FROM that timestamp (until the
    * next boundary); max concurrency is `max(active)` over it.
    *
    * Intervals are half-open [start, end): an interval ending at t
    * never overlaps one starting at t (the convention that makes
    * back-to-back sessions count 1, not 2). Zero-length intervals
    * contribute nothing. `endUsCol >= startUsCol` is the caller's
    * contract (violations subtract before they add — garbage in).
    *
    * Scale shape: the classic sweep line is a sequential scan; this
    * one is ONE hash partition on the key + ONE sort feeding two
    * window passes over the same (partition, order) — Catalyst plans
    * a single exchange and a single sort, reused (the scd2
    * discipline). ±1 deltas ride the shuffle, 16 bytes a row; a
    * key's whole timeline lands in one partition, so this scales to
    * any number of keys and any rows-per-key that fit a partition
    * sort (spill-backed). The running sum uses the default RANGE
    * frame so order-peers (equal ts, equal sign) share one value;
    * the last row per timestamp — located by the SAME sort via
    * lead() — carries the post-timestamp count, and -1 sorts before
    * +1 so the half-open convention falls out of the order key.
    */
  def concurrency(df: DataFrame, keyCol: String,
      startUsCol: String, endUsCol: String): DataFrame = {
    val deltas = df.select(col(keyCol), col(startUsCol).as("ts_us"),
        lit(1L).as("_d"))
      .union(df.select(col(keyCol), col(endUsCol).as("ts_us"),
        lit(-1L).as("_d")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("ts_us"), col("_d"))
    deltas
      .withColumn("active", sum(col("_d")).over(w))
      .withColumn("_nxt", lead(col("ts_us"), 1).over(w))
      .where(col("_nxt").isNull || col("_nxt") =!= col("ts_us"))
      .select(col(keyCol), col("ts_us"), col("active"))
  }

  /** Debounce (near-time dedup): drop events that follow their
    * per-key predecessor within `gapMicros` — the telemetry cleanup
    * for double-fired clicks, retried webhooks, and chatty sensors,
    * where EXACT dedup misses duplicates with jittered timestamps.
    * A row survives iff it is its key's first, or the gap to the
    * IMMEDIATELY PRECEDING event (kept or not) is >= gapMicros —
    * the lag definition, deterministic and windowable, unlike
    * "distance to previous KEPT" which is a sequential chain (that
    * variant is sessionization territory: [[graft.streaming
    * .StatefulOps.sessionizeStream]] with the gap as the session
    * gap). One hash partition + one sort; 16-byte rows ride the
    * shuffle. Ordering ties break on `tieCol` — at an exactly equal
    * timestamp the smaller tie survives and the rest debounce away
    * (gap 0 < gapMicros).
    */
  def debounce(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
      tieCol: String, gapMicros: Long): DataFrame = {
    require(keyCols.nonEmpty && gapMicros > 0,
      s"need keys and gapMicros > 0, got (${keyCols.size}, $gapMicros)")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol), col(tieCol))
    df.withColumn("_prev_ts", lag(col(tsUsCol), 1).over(w))
      .where(col("_prev_ts").isNull ||
        col(tsUsCol) - col("_prev_ts") >= gapMicros)
      .drop("_prev_ts")
  }

  /** Seasonal (period-bucket) decomposition: split each observation
    * into its key's PERIODIC component — the mean of its
    * period-position bucket (e.g. day-of-week means under the
    * default 7-day period) — and the residual, the de-seasonalized
    * signal anomaly detectors and trend fits should consume ("is
    * Monday low because Mondays are low, or is something wrong").
    *
    * Integer grid end to end: position = (ts_us div bucketMicros)
    * mod periodBuckets; seasonal_micro = floor(bucketSum·1e6 /
    * bucketCount) (exact long division of positive sums);
    * residual_micro = value·1e6 − seasonal_micro. One hash
    * partition: the bucket means come from an UNORDERED window over
    * (key, position) — no join, no second shuffle of the data.
    */
  def seasonalDecompose(df: DataFrame, keyCol: String, tsUsCol: String,
      valCol: String, periodBuckets: Int = 7,
      bucketMicros: Long = 86400000000L): DataFrame = {
    require(periodBuckets >= 2 && bucketMicros > 0,
      s"need periodBuckets >= 2 and bucketMicros > 0, got ($periodBuckets, $bucketMicros)")
    import graft.functions.intmath.ldiv
    val pos = expr(s"(`$tsUsCol` div ${bucketMicros}L) % $periodBuckets")
    val wb = Window.partitionBy(col(keyCol), col("_pos"))
    df.withColumn("_pos", pos.cast("long"))
      .withColumn("seasonal_micro",
        ldiv(sum(col(valCol)).over(wb) * 1000000L, count(lit(1)).over(wb)))
      .withColumn("residual_micro",
        col(valCol) * 1000000L - col("seasonal_micro"))
      .withColumnRenamed("_pos", "period_pos")
  }

  /** CUSUM changepoint screen: per key, the cumulative sum of
    * deviations from the key's overall mean, and the point where
    * |CUSUM| peaks — the classic "did this metric's level shift,
    * and when" detector (Page 1954): a mean shift makes the CUSUM
    * ramp, and the peak sits at the change. Output one row per key:
    * n, the peak timestamp, the signed peak CUSUM (micro units),
    * ready for a |peak| > h·n gate.
    *
    * Integer grid: mean_micro = floor(1e6·sum/cnt) (positive grid);
    * cusum_micro(i) = 1e6·runningSum(i) − i·mean_micro — longs
    * throughout, so the argmax (|cusum| desc, ts asc, tie asc) is
    * engine-exact. One hash partition on the key feeding the
    * unordered stats window, the running window, and the ranking
    * window — Catalyst plans one exchange.
    */
  def cusumChangepoint(df: DataFrame, keyCol: String, tsUsCol: String,
      valCol: String, tieCol: String): DataFrame = {
    import graft.functions.intmath.ldiv
    val wk = Window.partitionBy(col(keyCol))
    val wo = Window.partitionBy(col(keyCol))
      .orderBy(col(tsUsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = df
      .withColumn("_n", count(lit(1)).over(wk))
      .withColumn("_mean_u", ldiv(sum(col(valCol)).over(wk) * 1000000L, count(lit(1)).over(wk)))
      .withColumn("_rsum", sum(col(valCol)).over(wo))
      .withColumn("_rn", count(lit(1)).over(wo))
      .withColumn("cusum_micro",
        col("_rsum") * 1000000L - col("_rn") * col("_mean_u"))
    val wr = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("cusum_micro")).desc, col(tsUsCol), col(tieCol))
    scored.withColumn("_rk", row_number().over(wr))
      .where(col("_rk") === 1)
      .select(col(keyCol), col("_n").as("n"),
        col(tsUsCol).as("peak_ts_us"), col("cusum_micro").as("peak_cusum_micro"))
  }

  /** First-order transition matrix over per-key ordered sequences:
    * for every consecutive (state, next state) pair within a key's
    * timeline, the corpus-wide count and the row-normalized
    * probability — the Markov-chain view of user behavior ("what do
    * users do right after a click"). One shuffle to sort within keys
    * (lag window), one map-side-combined count; the output is
    * |states|^2-bounded regardless of input scale. Probability rides
    * the micro-unit floor grid so both engines render identically.
    *
    * Ordering within a key is (tsCol, tieCols...) — pass a unique id
    * for deterministic sequencing at equal timestamps.
    */
  def transitionCounts(df: DataFrame, keyCols: Seq[String], tsCol: String,
      stateCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    val wf = Window.partitionBy(col("from_state"))
    df.withColumn("_prev", lag(col(stateCol), 1).over(w))
      .where(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_state"), col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        floor(col("n").cast("double") / sum(col("n")).over(wf) * 1000000 + 0.5) / 1000000.0)
  }
}
