package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing + dedup operators (SURVEY.md §2 B32-B35).
  *
  * Each operator is a DataFrame -> DataFrame function that works
  * identically on a batch DataFrame (used by the DuckDB-oracle
  * correctness corpus) and on a streaming DataFrame (used by
  * StreamingSpec with watermarks + memory sink) — the Structured
  * Streaming contract: same code, incrementalized execution.
  *
  * Window starts are emitted as epoch microseconds (unix_micros /
  * DuckDB epoch_us) — integer, timezone-proof, hash-stable.
  */
object StreamingOps {

  /** B32 tumbling: fixed non-overlapping event-time buckets. */
  def tumblingAgg(events: DataFrame, ts: String, dur: String, keys: Column*): DataFrame =
    events.groupBy((window(col(ts), dur) +: keys): _*)
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + lit(0.5))) / lit(100.0)).as("value_sum"))
      .select((Seq(unix_micros(col("window.start")).as("win_start")) ++
        keys.map(k => k) :+ col("n") :+ col("value_sum")): _*)

  /** B32 sliding: overlapping windows (each event lands in size/slide
    * buckets; Spark expands via the TimeWindow generator).
    */
  def slidingAgg(events: DataFrame, ts: String, size: String, slide: String): DataFrame =
    events.groupBy(window(col(ts), size, slide))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start"), col("n"))

  /** B33 session windows: gap-merged per-key activity bursts. */
  def sessionAgg(events: DataFrame, ts: String, gap: String, key: String): DataFrame =
    events.groupBy(session_window(col(ts), gap), col(key))
      .agg(count(lit(1)).as("n"))
      .select(col(key),
        unix_micros(col("session_window.start")).as("sess_start"),
        unix_micros(col("session_window.end")).as("sess_end"),
        col("n"))

  /** B34: watermarked variant for streaming use — late data beyond
    * `delay` is dropped and state for closed windows is evicted (the
    * unbounded-state guard any 100 TB stream needs).
    */
  def tumblingAggWatermarked(events: DataFrame, ts: String, dur: String,
      delay: String, keys: Column*): DataFrame =
    tumblingAgg(events.withWatermark(ts, delay), ts, dur, keys: _*)

  /** B35 stream dedup on a key subset; `withinWatermark` bounds state. */
  def dedup(events: DataFrame, cols: Seq[String], watermarkCol: Option[(String, String)] = None): DataFrame =
    watermarkCol match {
      case Some((ts, delay)) =>
        events.withWatermark(ts, delay).dropDuplicatesWithinWatermark(cols)
      case None => events.dropDuplicates(cols)
    }
}
