package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1577836800000L + min * 60000L)

  private val clicks = Seq(
    (100L, 1L, ts(0)),   // user 1, t=0
    (101L, 1L, ts(10)),  // user 1, t=10
    (102L, 2L, ts(5)))   // user 2, t=5
    .toDF("event_id", "user_id", "ts")

  private def run(purchases: org.apache.spark.sql.DataFrame,
      tol: Option[Long]): Map[Long, Option[Long]] =
    Temporal.asofJoin(purchases, clicks, "user_id", "user_id", "ts", "ts",
        tieBreak = "event_id", toleranceSec = tol)
      .select(col("event_id"), col("asof.event_id").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

  test("asofJoin picks the most recent at-or-before right row per key") {
    val purchases = Seq(
      (200L, 1L, ts(12)),  // after both clicks -> 101
      (201L, 1L, ts(10)),  // exactly concurrent with 101 -> 101 (right sorts first)
      (202L, 1L, ts(3)),   // between clicks -> 100
      (203L, 2L, ts(4)),   // before user 2's click -> no match
      (204L, 3L, ts(9)))   // user with no clicks -> no match
      .toDF("event_id", "user_id", "ts")
    val got = run(purchases, None)
    assert(got == Map(200L -> Some(101L), 201L -> Some(101L),
      202L -> Some(100L), 203L -> None, 204L -> None))
  }

  test("asofJoin tolerance gates stale matches; the boundary is inclusive") {
    val purchases = Seq(
      (300L, 1L, ts(40)),  // 30 min after click 101: exactly at tolerance -> match
      (301L, 1L, ts(41)))  // 31 min after: beyond tolerance -> null
      .toDF("event_id", "user_id", "ts")
    val got = run(purchases, Some(1800L))
    assert(got == Map(300L -> Some(101L), 301L -> None))
  }

  test("asofJoin forward: earliest at-or-after right row; ties to the smallest id; forward tolerance") {
    val purchases = Seq(
      (300L, 1L, ts(5)),   // between clicks -> next is 101 (t=10)
      (301L, 1L, ts(10)),  // exactly concurrent -> 101 matches
      (302L, 1L, ts(11)),  // after the last click -> no match
      (303L, 2L, ts(0)),   // user 2: next click 102 at t=5
      (304L, 3L, ts(0)))   // no clicks -> no match
      .toDF("event_id", "user_id", "ts")
    def fwd(tol: Option[Long]) =
      Temporal.asofJoin(purchases, clicks, "user_id", "user_id", "ts", "ts",
          tieBreak = "event_id", toleranceSec = tol, direction = "forward")
        .select(col("event_id"), col("asof.event_id").as("m"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(fwd(None) == Map(300L -> Some(101L), 301L -> Some(101L),
      302L -> None, 303L -> Some(102L), 304L -> None))
    // 4-minute tolerance: purchase 300 (gap 5 min) drops; 303 (gap 5) drops
    assert(fwd(Some(240L)) == Map(300L -> None, 301L -> Some(101L),
      302L -> None, 303L -> None, 304L -> None))
    // equal-timestamp right rows tie to the SMALLEST id
    val twoClicks = Seq((200L, 9L, ts(10)), (201L, 9L, ts(10))).toDF("event_id", "user_id", "ts")
    val p = Seq((310L, 9L, ts(3))).toDF("event_id", "user_id", "ts")
    val got = Temporal.asofJoin(p, twoClicks, "user_id", "user_id", "ts", "ts",
        tieBreak = "event_id", direction = "forward")
      .select(col("asof.event_id")).collect().head.getLong(0)
    assert(got == 200L, s"forward tie must resolve to the smallest right id, got $got")
  }

  test("asofJoin rejects reserved-name collisions and a missing tieBreak up front") {
    val purchases = Seq((200L, 1L, ts(12))).toDF("event_id", "user_id", "ts")
    val clash = purchases.withColumn("_side", lit(1))
    val e1 = intercept[IllegalArgumentException] {
      Temporal.asofJoin(clash, clicks, "user_id", "user_id", "ts", "ts", "event_id")
    }
    assert(e1.getMessage.contains("_side"))
    val e2 = intercept[IllegalArgumentException] {
      Temporal.asofJoin(purchases, clicks.withColumnRenamed("event_id", "click_id"),
        "user_id", "user_id", "ts", "ts", "event_id")
    }
    assert(e2.getMessage.contains("BOTH frames"))
  }

  test("asofJoin plans one shuffle on the key: no range-join explosion, no cartesian") {
    val purchases = Seq((200L, 1L, ts(12))).toDF("event_id", "user_id", "ts")
    val df = Temporal.asofJoin(purchases, clicks, "user_id", "user_id",
      "ts", "ts", tieBreak = "event_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"as-of must be a window composition, not a join:\n${plan.take(2000)}")
  }

  test("pitJoin: as-of version, inclusive start, gap nulls, never-seen nulls, no future leak") {
    // key a history: v1 [10, 20), v2 [20, null); key b: [10, 15) then
    // a GAP (tombstoned) — no current version
    val hist = Seq(
      ("a", "v1", 10L, Some(20L)), ("a", "v2", 20L, None),
      ("b", "w1", 10L, Some(15L)))
      .toDF("k", "attr", "valid_from", "valid_to_o")
      .withColumn("valid_to", col("valid_to_o")).drop("valid_to_o")
    val facts = Seq(
      ("a", 1L, 5L),   // before first version -> null (no future leak)
      ("a", 2L, 10L),  // exactly at valid_from -> v1 (inclusive)
      ("a", 3L, 19L),  // inside v1
      ("a", 4L, 20L),  // boundary: v1 expired, v2 starts -> v2
      ("a", 5L, 99L),  // current version
      ("b", 6L, 12L),  // inside w1
      ("b", 7L, 30L),  // in the gap -> null, NOT stale w1
      ("c", 8L, 50L))  // never-seen key -> null
      .toDF("k", "fact_id", "ts")
    val got = Temporal.pitJoin(facts, hist, Seq("k"), "ts", Seq("attr"))
      .select(col("fact_id"), col("attr"), col("asof_valid_from"))
      .as[(Long, Option[String], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((None, None)), s"future leak: ${got(1L)}")
    assert(got(2L) == ((Some("v1"), Some(10L))))
    assert(got(3L) == ((Some("v1"), Some(10L))))
    assert(got(4L) == ((Some("v2"), Some(20L))), s"boundary must roll over: ${got(4L)}")
    assert(got(5L) == ((Some("v2"), Some(20L))))
    assert(got(6L) == ((Some("w1"), Some(10L))))
    assert(got(7L) == ((None, None)), s"gap must not leak the stale version: ${got(7L)}")
    assert(got(8L) == ((None, None)))
    assert(got.size == 8, "left-join semantics: every fact survives")
  }

  test("pitJoin plans one shuffle on the key — no range join, no cartesian") {
    val hist = Seq(("a", "v1", 10L, Option.empty[Long]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val facts = Seq(("a", 1L, 15L)).toDF("k", "fact_id", "ts")
    val plan = Temporal.pitJoin(facts, hist, Seq("k"), "ts", Seq("attr"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"PIT must be a window composition, not a join:\n${plan.take(2000)}")
  }

  test("concurrency: sweep line — overlaps counted, back-to-back is 1, zero-length invisible") {
    // key a: [0,10) [5,15) [10,20) — overlap at 5..10 is 2; 10 is
    // back-to-back (one ends, one starts) so stays 2, NOT 3; ends
    // step down. [7,7) is zero-length: its boundary row carries the
    // unchanged count. key b: disjoint singleton.
    val iv = Seq(("a", 0L, 10L), ("a", 5L, 15L), ("a", 10L, 20L),
      ("a", 7L, 7L), ("b", 100L, 110L)).toDF("k", "s_us", "e_us")
    val got = Temporal.concurrency(iv, "k", "s_us", "e_us")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 0L, 1L), ("a", 5L, 2L), ("a", 7L, 2L), ("a", 10L, 2L),
      ("a", 15L, 1L), ("a", 20L, 0L),
      ("b", 100L, 1L), ("b", 110L, 0L)), s"wrong step function: $got")
  }

  test("concurrency plans one exchange + one sort shared by both window passes") {
    val iv = Seq(("a", 0L, 10L), ("a", 5L, 15L)).toDF("k", "s_us", "e_us")
    val plan = Temporal.concurrency(iv, "k", "s_us", "e_us")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(exchanges == 1 && sorts == 1,
      s"sweep line must reuse one (partition, order): $exchanges exchanges, $sorts sorts\n${plan.take(2000)}")
    assert(!plan.contains("Join"), "sweep line must not join")
  }

  test("debounce: jittered repeats drop, gap boundary is inclusive, equal-ts keeps the smallest id") {
    val df = Seq(
      ("a", 0L, 1L),    // first -> kept
      ("a", 3L, 2L),    // gap 3 < 5 -> dropped
      ("a", 5L, 3L),    // gap 2 from ts=3 (dropped row still counts) -> dropped
      ("a", 10L, 4L),   // gap 5 >= 5 (inclusive) -> kept
      ("a", 15L, 5L),   // gap 5 -> kept
      ("b", 7L, 6L), ("b", 7L, 7L)) // equal ts: id 6 kept, id 7 debounced
      .toDF("k", "ts_us", "id")
    val got = Temporal.debounce(df, Seq("k"), "ts_us", "id", gapMicros = 5L)
      .select(col("id")).as[Long].collect().toSet
    assert(got == Set(1L, 4L, 5L, 6L), s"wrong survivors: $got")
  }

  test("seasonalDecompose: bucket means and residuals on a hand grid") {
    // 2-bucket period, bucket width 10: positions 0,1,0,1. bucket-0
    // mean (10+30)/2 = 20, bucket-1 mean (20+40)/2 = 30.
    val df = Seq(("a", 0L, 10L), ("a", 10L, 20L), ("a", 20L, 30L), ("a", 30L, 40L))
      .toDF("k", "ts_us", "v")
    val got = Temporal.seasonalDecompose(df, "k", "ts_us", "v",
        periodBuckets = 2, bucketMicros = 10L)
      .select(col("ts_us"), col("period_pos"), col("seasonal_micro"), col("residual_micro"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 20000000L, -10000000L),
      (20L, 0L, 20000000L, 10000000L),
      (10L, 1L, 30000000L, -10000000L),
      (30L, 1L, 30000000L, 10000000L)), s"wrong decomposition: $got")
  }

  test("cusumChangepoint: peak sits at the level shift, signed, deterministic") {
    // 10,10,10 then 20,20,20: mean 15, CUSUM (x1e6) -5,-10,-15,-10,-5,0
    // -> peak |15e6| at ts 3. Key b is flat: cusum 0 everywhere, the
    // (|cu|, ts) tie-break picks its FIRST row.
    val df = Seq(
      ("a", 1L, 1L, 10L), ("a", 2L, 2L, 10L), ("a", 3L, 3L, 10L),
      ("a", 4L, 4L, 20L), ("a", 5L, 5L, 20L), ("a", 6L, 6L, 20L),
      ("b", 1L, 7L, 5L), ("b", 2L, 8L, 5L))
      .toDF("k", "ts_us", "id", "v")
    val got = Temporal.cusumChangepoint(df, "k", "ts_us", "v", "id")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 6L, 3L, -15000000L),
      ("b", 2L, 1L, 0L)), s"wrong peaks: $got")
  }

  test("transitionCounts: per-key consecutive pairs, normalized per from_state, id tie-break") {
    val log = Seq(
      // user 1: a -> b -> a; user 2: a -> b; equal-ts pair on user 2
      // ordered by id: (b id 6) then (c id 7) -> b->c transition
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (2L, 10L, 5L, "a"), (2L, 50L, 6L, "b"), (2L, 50L, 7L, "c"))
      .toDF("uid", "ts", "eid", "state")
    val got = Temporal.transitionCounts(log, Seq("uid"), "ts", "state", Seq("eid"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // from a: 2x a->b (p 1.0); from b: b->a and b->c (p 0.5 each)
    assert(got == Set(
      ("a", "b", 2L, 1.0),
      ("b", "a", 1L, 0.5),
      ("b", "c", 1L, 0.5)), s"wrong transitions: $got")
  }

  test("gapFill: dense spine, last-sample-wins within bucket, forward fill") {
    // key 1 samples at buckets 0 (two samples: id 1 v=10 then id 2
    // v=20 -> 20 wins), 3 (v=30); buckets 1, 2 are gaps filled with 20.
    // key 2: single sample -> one-row spine, no gaps.
    val df = Seq(
      (1L, 5L, 1L, 10L), (1L, 9L, 2L, 20L), (1L, 35L, 3L, 30L),
      (2L, 17L, 4L, 77L))
      .toDF("k", "ts_us", "id", "v")
    val got = Temporal.gapFill(df, "k", "ts_us", "v", "id", stepMicros = 10L)
      .orderBy(col("k"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 20L, 0L), (1L, 1L, 20L, 1L), (1L, 2L, 20L, 1L),
      (1L, 3L, 30L, 0L), (2L, 1L, 77L, 0L)), s"wrong fill: ${got.toSeq}")
  }

  test("dyadicDecayScore: exact dyadic weights, truncation, integer quotient") {
    // lagCap 2 -> weights 4, 2, 1 at lags 0, 1, 2.
    val df = Seq((1L, 1L, 1L, 8L), (1L, 2L, 2L, 0L), (1L, 3L, 3L, 4L), (1L, 4L, 4L, 4L))
      .toDF("k", "ts", "id", "v")
    val got = Temporal.dyadicDecayScore(df, "k", "ts", "v", "id", lagCap = 2)
      .orderBy(col("id"))
      .select(col("num"), col("den"), col("score_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // row1: num=8*4=32 den=4 -> 8e6; row2: 0*4+8*2=16 den=6 -> 2666666
    // row3: 4*4+0*2+8*1=24 den=7 -> 3428571; row4: 4*4+4*2+0*1=24 den=7
    assert(got.toSeq == Seq(
      (32L, 4L, 8000000L), (16L, 6L, 2666666L),
      (24L, 7L, 3428571L), (24L, 7L, 3428571L)), s"wrong: ${got.toSeq}")
  }

  test("rollingAnomalies: integer z-test flags the spike, not the steady rows") {
    // n=2, k=1: window = two preceding values. Steady 10,10 then a 40
    // spike: (2*40-20)^2=3600 > 1*(2*200-400)=0 -> flagged. The row
    // after the spike (v=10, window 10,40): (20-50)^2=900 > (2*1700-2500)=900
    // is FALSE (strict >) -> not flagged. First two rows unscored.
    val df = Seq((1L, 1L, 1L, 10L), (1L, 2L, 2L, 10L), (1L, 3L, 3L, 40L),
      (1L, 4L, 4L, 10L))
      .toDF("k", "ts", "id", "v")
    val got = Temporal.rollingAnomalies(df, "k", "ts", "v", "id", n = 2, k = 1)
      .select(col("id"), col("dev2"), col("nvar"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, 3600L, 0L)), s"wrong flags: ${got.toSeq}")
  }

  test("linearTrend: perfect line recovers its slope; zero time spread yields null") {
    // key 1: y = 2x at x = 0,1,2 s -> num=12, den=6, slope 2.0.
    // key 2: both samples in the same second -> den 0 -> null slope.
    val df = Seq((1L, 0L, 0L), (1L, 1000000L, 2L), (1L, 2000000L, 4L),
      (2L, 100L, 5L), (2L, 200L, 9L))
      .toDF("k", "ts_us", "v")
    val got = Temporal.linearTrend(df, "k", "ts_us", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set((1L, 3L, 12L, 6L, Some(2.0)), (2L, 2L, 0L, 0L, None)),
      s"wrong trends: $got")
  }

  test("correlationMatrix: perfect correlation is 1.0, anti-correlation -1.0, join is pairwise-complete") {
    // series a=(1,2,3), b=(2,4,6) over days 1-3 -> r=1; c=(3,2,1) vs a
    // -> r=-1. Day 4 exists only in a -> excluded from its pairs.
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 99L),
      ("b", 1L, 2L), ("b", 2L, 4L), ("b", 3L, 6L),
      ("c", 1L, 3L), ("c", 2L, 2L), ("c", 3L, 1L))
      .toDF("series", "day", "v")
    val got = Temporal.correlationMatrix(df, "series", "day", "v")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(6))))
      .toMap
    assert(got(("a", "b")) == (3L, 1.0), s"a-b: $got")
    assert(got(("a", "c")) == (3L, -1.0), s"a-c: $got")
    assert(got(("b", "c")) == (3L, -1.0), s"b-c: $got")
  }

  test("timeWeightedAvg: zero-order hold, integer second durations, micro floor") {
    // key 1: v=100 holds 3s, v=200 holds 1s -> twa = 500/4 = 125.0;
    // last sample contributes nothing. key 2: single sample -> no
    // intervals -> absent from output.
    val df = Seq(
      (1L, 0L, 1L, 100L), (1L, 3000000L, 2L, 200L), (1L, 4000000L, 3L, 999L),
      (2L, 0L, 4L, 5L))
      .toDF("k", "ts_us", "id", "v")
    val got = Temporal.timeWeightedAvg(df, "k", "ts_us", "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 2L, 500L, 4L, 125.0)), s"wrong twa: ${got.toSeq}")
  }
}
