package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles by distributed two-pass bucketed
  * selection — the data is never fully shuffled OR fully sorted.
  *
  * Spark's built-in `percentile` is a TypedImperativeAggregate that
  * buffers EVERY (value -> count) per group in an in-memory map and
  * merges those maps single-threaded per group — measured 8.6 s for
  * 600k rows / 3 groups at sf0.1, the whole-corpus bench outlier. A
  * sort-based window reformulation still shuffles every row to its
  * group's partition (measured ~4 s — the shuffle IS the cost: the
  * values are nearly unique, so map-side combine cannot compress a
  * value histogram either).
  *
  * This operator's plan:
  *  1. bucket-count pass: group rows by (group, coarse range bucket)
  *     where the bucket is [[graft.functions.DoubleOrderBits]] — an
  *     order-preserving prefix of the double's bit pattern, a pure
  *     per-row expression needing NO min/max pre-pass. The aggregation
  *     is map-side-combined; the shuffle carries one long per
  *     OCCUPIED bucket per group.
  *  2. rank location (on that tiny frame): cumulative counts in bucket
  *     order locate, for each target rank floor(p*(n-1))+1 and its +1
  *     neighbor, the bucket holding it and the residual rank inside.
  *  3. selection pass: re-scan keeping ONLY rows in needed buckets
  *     (expected n/occupied-buckets of the data), rank those few rows
  *     within their bucket, pick the residual ranks.
  * Then interpolate lo + (hi - lo) * frac — the same linear
  * interpolation as Spark's `percentile` and DuckDB's `quantile_cont`
  * (ApproxSpec asserts bit-level agreement with the built-in).
  *
  * Every intermediate frame is referenced exactly once, so the plan
  * contains exactly two scans of the input — beware: a DAG that
  * references a subframe twice re-runs its whole lineage including
  * the scan (Spark shares no subplans without explicit persist).
  *
  * At 100 TB the trade is decisive: this shuffles kilobytes (bucket
  * counters + the handful of selected rows) where the alternatives
  * shuffle the whole table; the second scan is the cheap currency
  * (columnar, pruned). Degenerate distributions (all mass in one
  * bucket) degrade gracefully: the selection pass is at worst that
  * bucket's occupancy, and equal values always share a bucket so
  * selection stays exact. For mergeable streaming sketches use
  * approx_percentile (t-digest) — ApproxSpec asserts its error bound
  * against this exact operator.
  */
object Quantiles {

  /** One row per group: a column per requested percentile, plus `n`
    * (the group's non-null row count).
    *
    * @param ps (output column name, fraction in [0, 1]) pairs
    * @param shift bits dropped from the 64-bit order key; 44 keeps a
    *              20-bit bucket space (sign + exponent + 8 mantissa
    *              bits — plenty of spread for any realistic measure)
    */
  def exactPercentiles(df: DataFrame, group: Column, value: Column,
      ps: Seq[(String, Double)], shift: Int = 44,
      interpolate: Boolean = true): DataFrame = {
    // shift >= 1 keeps bucket keys non-negative: the rank-location
    // window sorts _b as a SIGNED long, and the full 64-bit order key
    // is only unsigned-comparable
    require(shift >= 1 && shift < 64, s"shift $shift out of [1, 64)")
    require(ps.nonEmpty, "at least one percentile required")
    // out-of-range fractions would silently produce null output
    // columns (their rank matches no bucket interval) — fail eagerly
    ps.foreach { case (name, p) =>
      require(p >= 0.0 && p <= 1.0, s"percentile $name=$p out of [0, 1]")
    }
    val bucket = graft.functions.orderbits.doubleOrderBits(col("_v"), shift)
    val rows = df.select(group.as("_g"), value.cast("double").as("_v"))
      .filter(col("_v").isNotNull)
    // pass 1: per-(group, bucket) counts — the tiny histogram frame
    val hist = rows.groupBy(col("_g"), bucket.as("_b")).agg(count(lit(1)).as("_c"))
    // pass 2 over only the needed-bucket rows
    selectRanks(rows, bucket, locateRanks(hist, ps), ps, interpolate)
      .withColumnRenamed("_n", "n")
  }

  /** Rank location over a (\_g, \_b, \_c, ...) bucket histogram —
    * shared bit-for-bit by [[exactPercentiles]] and [[medianMad]] so
    * the two cannot drift: cumulative + total counts (windows over
    * occupied buckets, not rows), then for each target rank
    * floor(p*(n-1))+1 and its +1 neighbor (clamped to n so p = 1.0
    * stays in range; its interpolation weight there is 0) the bucket
    * holding it and the residual in-bucket rank. One compact row per
    * needed (group, bucket) so the selection join cannot duplicate
    * rows. Only _g/_b/_c are read; extra histogram columns
    * (medianMad's min/max) are IGNORED and absent from the output —
    * callers needing them re-join the histogram (as medianMad does).
    */
  private def locateRanks(hist: DataFrame,
      ps: Seq[(String, Double)]): DataFrame = {
    val byG = Window.partitionBy(col("_g"))
    val cumb = hist
      .withColumn("_cum", sum(col("_c")).over(byG.orderBy(col("_b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum(col("_c")).over(byG))
    val rankStructs = array(ps.flatMap { case (name, p) =>
      val lo = (floor(lit(p) * (col("_n") - 1).cast("double")) + 1).cast("long")
      Seq(struct(lit(s"lo_$name").as("_rname"), lo.as("_r")),
        struct(lit(s"hi_$name").as("_rname"), least(lo + 1, col("_n")).as("_r")))
    }: _*)
    cumb
      .select(col("_g"), col("_b"), col("_c"), col("_cum"), col("_n"),
        explode(rankStructs).as("_rk"))
      .filter(col("_cum") - col("_c") < col("_rk._r") && col("_rk._r") <= col("_cum"))
      .groupBy(col("_g"), col("_b"))
      .agg(collect_list(struct(col("_rk._rname").as("_rname"),
        (col("_rk._r") - (col("_cum") - col("_c"))).as("_rr"))).as("_rs"),
        max(col("_n")).as("_n"))
  }

  /** Selection pass shared by [[exactPercentiles]] and [[medianMad]]:
    * keep only needed-bucket rows of the (\_g, \_v) frame, rank
    * locally within each (group, bucket), pick the residual ranks and
    * interpolate. Returns one row per group: `_g`, a column per
    * percentile name, and `_n` (the group's non-null row count).
    * interpolate=false yields the DISCRETE rank-select value at rank
    * floor(p*(n-1))+1 (q150's convention) — an actual data value,
    * bit-exact across engines with no interpolation arithmetic.
    */
  private def selectRanks(rows: DataFrame, bucket: Column,
      needed: DataFrame, ps: Seq[(String, Double)],
      interpolate: Boolean): DataFrame = {
    val picked = rows
      .withColumn("_b", bucket)
      .join(broadcast(needed), Seq("_g", "_b"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_g"), col("_b")).orderBy(col("_v"))))
      .select(col("_g"), col("_n"), col("_v"), col("_rn"), explode(col("_rs")).as("_rk"))
      .filter(col("_rn") === col("_rk._rr"))
      .groupBy(col("_g"))
      .agg(map_from_entries(collect_list(struct(col("_rk._rname"), col("_v")))).as("_m"),
        max(col("_n")).as("_n"))
    val outs = ps.map { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1).cast("double")
      val loV = col("_m").getItem(s"lo_$name")
      val hiV = col("_m").getItem(s"hi_$name")
      if (interpolate) (loV + (hiV - loV) * (pos - floor(pos))).as(name)
      else loV.as(name)
    }
    picked.select((col("_g") +: outs :+ col("_n")): _*)
  }

  /** Winsorization — clip, don't drop: replace each row's value by
    * its group's [pLo, pHi] percentile bound when it falls outside,
    * the standard tail-taming step before means/regressions on
    * heavy-tailed measures (a mean survives winsorizing; it does not
    * survive one colossal outlier). Bounds are DISCRETE rank-select
    * percentiles (actual data values, no interpolation), so on an
    * integer grid every comparison and the clipped output are
    * bit-exact on any engine.
    *
    * Output: the input plus `wlo`, `whi` (the group's clip bounds)
    * and `winsorized` (the clipped value as double). EVERY input row
    * survives — clip, don't drop: rows whose group expression is
    * null, or whose group has no non-null values (so no bounds
    * exist), pass through with null `wlo`/`whi` and `winsorized` =
    * the RAW value via the LEFT join (an inner join would silently
    * drop them, since null keys never equi-join); null VALUES stay
    * null (Spark's least/greatest skip nulls, which would otherwise
    * fabricate a bound where a measurement is missing). Plan: one
    * [[exactPercentiles]] round for the bounds (kilobyte shuffles,
    * two scans) + one broadcast join back — per-row work is a narrow
    * least/greatest; the data is never sorted or shuffled.
    */
  def winsorize(df: DataFrame, group: Column, value: Column,
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val reserved = Seq("wlo", "whi", "winsorized", "_wg")
    val clashes = df.columns.filter(reserved.contains).distinct
    require(clashes.isEmpty,
      s"winsorize reserves ${reserved.mkString(", ")}; rename ${clashes.mkString(", ")}")
    val bounds = exactPercentiles(df, group, value,
        Seq("wlo" -> pLo, "whi" -> pHi), interpolate = false)
      .select(col("_g").as("_wg"), col("wlo"), col("whi"))
    df.withColumn("_wg", group)
      .join(broadcast(bounds), Seq("_wg"), "left")
      // explicit null gates: least/greatest SKIP nulls, so without
      // them a null value would clip to wlo (a fabricated data point)
      // and a null-bound row would look clipped when it is not
      .withColumn("winsorized",
        when(value.isNull || col("wlo").isNull, value.cast("double"))
          .otherwise(least(greatest(value.cast("double"), col("wlo")), col("whi"))))
      .drop("_wg")
  }

  /** Per-group (median, MAD) in FOUR data scans where the naive
    * composition pays five — the round-12 fusion of [[robustOutliers]]'
    * two [[exactPercentiles]] rounds.
    *
    * The trick: the MAD (median of |v - med|) needs no second
    * HISTOGRAM pass. The median pass's bucket frame — extended with
    * per-bucket min/max, free aggregates on the same shuffle — plus
    * the exact median m bounds every bucket's possible deviations:
    *   minDev = greatest(0, mn - m, m - mx),  maxDev = greatest(mx - m, m - mn)
    * From those intervals, two weighted order-sweeps over the TINY
    * bucket frame locate which buckets could hold the deviation ranks
    * r = floor(0.5*(n-1))+1 and r+1:
    *   below(b) = sum c_j over { j : maxDev_j <  minDev_b }   (strict)
    *   poss(b)  = sum c_j over { j : minDev_j <= maxDev_b }   (ties in)
    * A bucket is a CANDIDATE iff poss(b) >= r and below(b) < rHi.
    * Every non-candidate is then provably on one side: poss(j) < r
    * means all of j's deviations rank strictly below r (at most
    * poss(j) < r deviations are <= maxDev_j); below(j) >= rHi means
    * they all rank strictly above rHi. So ranking the candidate rows'
    * exact deviations and offsetting by the case-A mass
    * (offset = sum c_j over poss(j) < r) selects the true global
    * deviation ranks — the same selection-pass argument
    * [[exactPercentiles]] makes per bucket, lifted to a bucket SET.
    *
    * Plan: scan 1 = histogram (count/min/max per (group, order-bits
    * bucket), map-side combined); scan 2 = median selection
    * ([[exactPercentiles]] arithmetic verbatim); scan 3 = MAD
    * selection over candidate-bucket rows only; the caller's flag
    * pass is scan 4. The bucket frame is persisted — kilobyte-sized
    * by the 2^(64-shift) bucket-space bound — because it feeds TWO
    * downstream lineages (median location + deviation intervals) and
    * an un-pinned reference would re-run its full scan per consumer
    * (the DAG-duplication regression exactPercentiles documents),
    * then released before return once the candidate-bucket frame is
    * eagerly checkpointed (so long-lived sessions never accrete
    * CacheManager entries — scans 1+2 run at build, scan 3 stays
    * lazy); every other frame is referenced once, and med/_n ride the
    * candidate rows into the MAD scan so the median lineage runs
    * exactly once. Both sweeps share one
    * window pass (see the sweep comment). Interpolation, rank
    * arithmetic and
    * tie handling match exactPercentiles bit for bit, so q123's
    * med/mad values are unchanged (same oracle).
    */
  def medianMad(df: DataFrame, group: Column, value: Column): DataFrame = {
    val bucket = graft.functions.orderbits.doubleOrderBits(col("_v"), 44)
    val rows = df.select(group.as("_g"), value.cast("double").as("_v"))
      .filter(col("_v").isNotNull)

    // scan 1: per-(group, bucket) count + min/max, pinned (tiny).
    // The pin only needs both consumers (median location + deviation
    // intervals) to share one materialization; it is explicitly
    // unpersist()ed below once `cand` is checkpointed — persist
    // registers the plan in the CacheManager, which holds the entry
    // (executor blocks included) until unpersist/clearCache, so
    // leaving it to scope-exit would accrete one cache entry per
    // medianMad call in a long-lived session.
    val hist = rows.groupBy(col("_g"), bucket.as("_b"))
      .agg(count(lit(1)).as("_c"), min(col("_v")).as("_mn"), max(col("_v")).as("_mx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // scan 2: median rank location + selection via the SAME
    // locateRanks/selectRanks helpers exactPercentiles runs — shared
    // code, so the two paths cannot drift. The median frame is
    // referenced exactly once (by `iv`), and med/_n then RIDE the
    // candidate frame into the MAD selection, so this lineage runs
    // once with no checkpoint.
    val med = selectRanks(rows, bucket,
        locateRanks(hist, Seq(("med", 0.5))), Seq(("med", 0.5)),
        interpolate = true)
      .select(col("_g"), col("_n"), col("med"))

    // deviation interval of each bucket, exact from its true min/max
    val iv = hist.join(broadcast(med), "_g")
      .select(col("_g"), col("_b"), col("_c"), col("med"), col("_n"),
        greatest(lit(0.0), col("_mn") - col("med"), col("med") - col("_mx")).as("_dlo"),
        greatest(col("_mx") - col("med"), col("med") - col("_mn")).as("_dhi"))

    // ONE weighted order-sweep serves both counts: each bucket emits
    // two rows — its interval START (tag 0: poss-event carrying _w2=c,
    // and below-QUERY point) and its interval END (tag 1: below-event
    // carrying _w=c, and poss-QUERY point). Sorted by (val, tag),
    // the running sum of _w at a tag-0 row counts intervals that
    // ENDED strictly before this start (below: strict <, since
    // same-value ends sort after), and the running sum of _w2 at a
    // tag-1 row counts intervals that STARTED at or before this end
    // (poss: ties in, since same-value starts sort first). Query
    // rows carry zero weight, so tie order among them is irrelevant.
    val sweep = iv.select(col("_g"), col("_b"), col("_c"), col("med"), col("_n"),
        explode(array(
          struct(col("_dlo").as("_val"), lit(0).as("_tag"),
            lit(0L).as("_w"), col("_c").as("_w2")),
          struct(col("_dhi").as("_val"), lit(1).as("_tag"),
            col("_c").as("_w"), lit(0L).as("_w2")))).as("_e"))
      .select(col("_g"), col("_b"), col("_c"), col("med"), col("_n"),
        col("_e._val").as("_val"), col("_e._tag").as("_tag"),
        col("_e._w").as("_w"), col("_e._w2").as("_w2"))
    val wv = Window.partitionBy(col("_g"))
      .orderBy(col("_val"), col("_tag"), col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats2 = sweep
      .withColumn("_cw", sum(col("_w")).over(wv))
      .withColumn("_cw2", sum(col("_w2")).over(wv))
      .groupBy(col("_g"), col("_b"))
      .agg(max(col("_c")).as("_c"), max(col("med")).as("med"), max(col("_n")).as("_n"),
        max(when(col("_tag") === 0, col("_cw"))).as("_below"),
        max(when(col("_tag") === 1, col("_cw2"))).as("_poss"))

    val rLo = (floor(lit(0.5) * (col("_n") - 1).cast("double")) + 1).cast("long")
    val rHi = least(rLo + 1, col("_n"))
    // case-A mass (buckets whose deviations all rank < rLo) via a
    // same-frame window — no separate aggregate + join-back
    // EAGER checkpoint: `cand` is the only frame through which the
    // returned plan still references `hist` (it carries med/_n and the
    // residual ranks), and it is kilobyte-sized like the bucket frame
    // itself — materializing it here lets `hist` be unpersisted BEFORE
    // this function returns, so repeated medianMad/robustOutliers
    // calls in a long-lived session cannot accrete CacheManager
    // entries. Scans 1+2 run inside this driver job; the returned
    // frame (scan 3) stays lazy over the checkpointed candidates.
    val cand = stats2
      .withColumn("_rlo", rLo).withColumn("_rhi", rHi)
      .withColumn("_off", sum(when(col("_poss") < col("_rlo"), col("_c"))
        .otherwise(lit(0L))).over(Window.partitionBy(col("_g"))))
      .filter(col("_poss") >= col("_rlo") && col("_below") < col("_rhi"))
      .select(col("_g"), col("_b"), col("med"), col("_n"),
        (col("_rlo") - col("_off")).as("_tlo"), (col("_rhi") - col("_off")).as("_thi"))
      .localCheckpoint()
    hist.unpersist()

    // scan 3: rank candidate rows' exact deviations, pick the two
    // residual ranks, interpolate — one row per group out
    val madPos = lit(0.5) * (col("_n") - 1).cast("double")
    rows
      .withColumn("_b", bucket)
      .join(broadcast(cand), Seq("_g", "_b"))
      .withColumn("_dev", abs(col("_v") - col("med")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_g")).orderBy(col("_dev"), col("_v"))))
      .filter(col("_rn") === col("_tlo") || col("_rn") === col("_thi"))
      .groupBy(col("_g"))
      .agg(max(col("med")).as("med"), max(col("_n")).as("_n"),
        min(when(col("_rn") === col("_tlo"), col("_dev"))).as("_devLo"),
        min(when(col("_rn") === col("_thi"), col("_dev"))).as("_devHi"))
      .select(col("_g"), col("med"),
        (col("_devLo") + (col("_devHi") - col("_devLo")) *
          (madPos - floor(madPos))).as("mad"))
  }

  /** Robust per-group outlier detection: flag rows whose absolute
    * deviation from the group MEDIAN exceeds `k` times the group's
    * MAD (median absolute deviation) — the mean/stddev z-score's
    * robust sibling: one colossal outlier shifts a mean and inflates
    * a stddev enough to mask its peers (masking), while the median
    * and MAD ignore it. The standard guardrail for metric monitoring
    * and training-data value screening.
    *
    * Output: the input rows that are outliers, plus `med` and `mad`
    * columns. Pass integer-valued data (cents grids) and both medians
    * are exact .0/.5 doubles, so the k*MAD comparison is reproducible
    * on any engine (q123).
    *
    * Cost: one [[medianMad]] round (three scans — histogram, median
    * selection, MAD selection over candidate buckets only) + one
    * final flag scan: FOUR scans, kilobyte shuffles, nothing
    * resembling a sort of the data (the naive two-exactPercentiles
    * composition paid five). Cache/persist the input upstream if
    * scans dominate. The med/mad table is one row per group — always
    * broadcast.
    */
  def robustOutliers(df: DataFrame, group: Column, value: Column,
      k: Double = 3.0): DataFrame = {
    val reserved = Seq("med", "mad", "_rg", "_rv")
    val clashes = df.columns.filter(reserved.contains).distinct
    require(clashes.isEmpty,
      s"robustOutliers reserves column names ${reserved.mkString(", ")} " +
        s"for its output/scratch; rename the input columns ${clashes.mkString(", ")} first")
    val base = df.withColumn("_rg", group).withColumn("_rv", value.cast("double"))
    val mm = medianMad(base, col("_rg"), col("_rv"))
      .select(col("_g").as("_rg"), col("med"), col("mad"))
    base.join(broadcast(mm), "_rg")
      .filter(abs(col("_rv") - col("med")) > lit(k) * col("mad"))
      .drop("_rg", "_rv")
  }

  /** Equi-depth binning (feature bucketization): assign each row the
    * index of its value's percentile bucket — `nBins` buckets bounded
    * by the group's interpolated (i/nBins)-percentiles. The
    * feature-engineering step that turns a skewed measure into a
    * uniform categorical (and the build step of an equi-depth
    * histogram).
    *
    * Plan: boundaries come from ONE [[exactPercentiles]] round
    * (kilobyte shuffles), broadcast back — the per-row assignment is
    * a narrow count-of-boundaries-below fold; nothing re-sorts or
    * re-shuffles the data, unlike an ntile window which would shuffle
    * every row into its group's partition. On the cents grid the
    * boundaries are exact .0/.5 doubles, so bin membership of
    * boundary-valued rows is engine-independent (q132; strict `>`
    * contract: a row equal to boundary i stays in bin i-1's side).
    * Use power-of-two nBins when an external engine must replay the
    * fractions bit-exactly (1/4 = 0.25 is an exact double; 1/3 is
    * not).
    */
  def equiDepthBin(df: DataFrame, group: Column, value: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val ps = (1 until nBins).map(i => (s"_q$i", i.toDouble / nBins))
    val bounds = exactPercentiles(df, group, value, ps)
      .select(col("_g").as("_eb_g") +: ps.map { case (n, _) => col(n) }: _*)
    val bin = ps.map { case (n, _) =>
      when(value.cast("double") > col(n), 1).otherwise(0)
    }.reduce(_ + _)
    df.withColumn("_eb_g", group)
      .join(broadcast(bounds), "_eb_g")
      .withColumn("bin", bin)
      .drop("_eb_g" +: ps.map(_._1): _*)
  }
}
