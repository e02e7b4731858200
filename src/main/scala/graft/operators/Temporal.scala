package graft.operators

import org.apache.spark.sql.DataFrame
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
