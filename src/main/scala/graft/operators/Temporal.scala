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
}
