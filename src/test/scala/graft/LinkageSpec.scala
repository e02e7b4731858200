package graft

import org.apache.spark.sql.functions._

import graft.operators.{ChangeCapture, Linkage}

/** Entity resolution (fuzzy matching) and change capture (snapshot
  * diff, SCD2 history).
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyPairs: finds pairs within distance, orients lexicographically, carries counts") {
    val df = Seq("red bolt", "red bolt", "ted bolt", "old bolt", "blue gear")
      .toDF("name")
    val got = Linkage.fuzzyPairs(df, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // red~ted dist 1, red~old dist 2 ("old bolt" vs "red bolt"),
    // old~ted dist 2; blue gear matches nothing within 2
    assert(got == Set(
      ("red bolt", "ted bolt", 1L, 2L, 1L),
      ("old bolt", "red bolt", 2L, 1L, 2L),
      ("old bolt", "ted bolt", 2L, 1L, 1L)), s"wrong pairs: $got")
  }

  test("fuzzyPairs: length-band blocking is lossless across adjacent buckets") {
    // lengths 2 and 4 with maxDist 2: bucket floor(2/2)=1 vs
    // floor(4/2)=2 — adjacent buckets, pair must still surface
    val df = Seq("ab", "abde", "zzzzzzzz").toDF("name")
    val got = Linkage.fuzzyPairs(df, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("ab", "abde", 2L)), s"wrong pairs: $got")
  }

  test("fuzzyPairs: nulls ignored, minDist excludes sub-threshold pairs, extraBlock restricts") {
    val df = Seq(Some("abc"), Some("abd"), Some("abe"), None).toDF("name")
    // minDist 2 excludes all the distance-1 pairs
    assert(Linkage.fuzzyPairs(df, "name", maxDist = 2, minDist = 2).count() == 0L)
    // first-letter blocking keeps the abc family comparable
    val blocked = Linkage.fuzzyPairs(df, "name", maxDist = 2,
      extraBlock = Some(substring(col("name"), 1, 1)))
    assert(blocked.count() == 3L)
    // blocking on a key that splits them compares nothing
    val split = Linkage.fuzzyPairs(df, "name", maxDist = 2,
      extraBlock = Some(substring(col("name"), 3, 1)))
    assert(split.count() == 0L)
  }

  test("linkBest: nearest catalog match, self at 0, lexicographic ties, null when unmatched") {
    val dirty = Seq("red bolt", "red bolt", "redd bolt", "zzz", "ac").toDF("name")
    val catalog = Seq("red bolt", "old bolt", "ab", "ad").toDF("cname")
    val got = Linkage.linkBest(dirty, catalog, "name", "cname", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    assert(got == Set(
      ("red bolt", 2L, "red bolt", 0L),   // catalog member -> itself
      ("redd bolt", 1L, "red bolt", 1L),  // one insertion away
      ("ac", 1L, "ab", 1L),               // tie ab/ad both dist 1 -> lexicographic
      ("zzz", 1L, null, -1L)), s"wrong links: $got")
  }

  test("linkBest: catalog replication reaches adjacent length buckets") {
    // dirty len 4 (bucket 2), catalog len 2 (bucket 1): only the
    // 3-bucket catalog replication makes them meet
    val got = Linkage.linkBest(Seq("abde").toDF("n"), Seq("ab").toDF("c"),
        "n", "c", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(("abde", "ab", 2L)), s"wrong links: $got")
  }

  test("snapshotDiff: tags I/U/D, drops unchanged, null-safe compare") {
    val oldDf = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0))
      .toDF("k", "tag", "bal")
    val newDf = Seq(
      (1L, Some("a"), 10.0),                 // unchanged -> dropped
      (2L, Some("B"), 20.0),                 // updated
      (3L, None: Option[String], 30.0),      // unchanged w/ null attr -> dropped
      (5L, Some("e"), 50.0))                 // inserted; 4 deleted
      .toDF("k", "tag", "bal")
    val got = ChangeCapture.snapshotDiff(oldDf, newDf, Seq("k"), Seq("tag", "bal"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "U", 4L -> "D", 5L -> "I"), s"wrong diff: $got")
  }

  test("scd2: collapses repeats, assigns intervals, flags current, breaks ties on id") {
    val log = Seq(
      // user 1: a,a,b,a -> three versions
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"), (1L, 40L, 4L, "a"),
      // user 2: one row -> one open version
      (2L, 15L, 5L, "x"),
      // user 2... equal-ts change ordered by id: y(id 6) then z(id 7)
      (2L, 50L, 6L, "y"), (2L, 50L, 7L, "z"))
      .toDF("uid", "ts", "eid", "state")
    val got = ChangeCapture.scd2(log, Seq("uid"), "ts", Seq("state"), tieCols = Seq("eid"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      (1L, "a", 10L, 30L, 0L),
      (1L, "b", 30L, 40L, 0L),
      (1L, "a", 40L, -1L, 1L),
      (2L, "x", 15L, 50L, 0L),
      (2L, "y", 50L, 50L, 0L),
      (2L, "z", 50L, -1L, 1L)), s"wrong history: $got")
  }

  test("scd2 plans one shuffle: both window passes share the key exchange") {
    val log = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b")).toDF("uid", "ts", "eid", "state")
    val plan = ChangeCapture.scd2(log, Seq("uid"), "ts", Seq("state"), Seq("eid"))
      .queryExecution.executedPlan.toString
    val n = "Exchange".r.findAllIn(plan).length
    assert(n == 1, s"expected a single exchange, got $n:\n${plan.take(2000)}")
    assert(!plan.contains("Join"), s"scd2 must be window-only:\n${plan.take(2000)}")
  }

  test("fuzzyPairs: candidate generation is an equi-join, never a cartesian") {
    val df = Seq("red bolt", "ted bolt").toDF("name")
    val plan = Linkage.fuzzyPairs(df, "name", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"blocked candidates must equi-join:\n${plan.take(2000)}")
  }

  test("maintainAgg: refresh equals full recompute incl. group migration and group drop") {
    val oldF = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L))
      .toDF("k", "g", "v")
    // 1 unchanged, 2 migrates a->b with a new value, 4 deleted (group
    // c empties out), 5 inserted into a
    val newF = Seq((1L, "a", 10L), (2L, "b", 25L), (3L, "b", 30L), (5L, "a", 50L))
      .toDF("k", "g", "v")
    val base = oldF.groupBy(col("g")).agg(count(lit(1)).as("cnt"), sum(col("v")).as("v"))
    val diff = ChangeCapture.snapshotDiff(oldF, newF, Seq("k"), Seq("g", "v"))
    val got = ChangeCapture.maintainAgg(base, diff, Seq("g"), Seq("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = newF.groupBy(col("g")).agg(count(lit(1)).as("cnt"), sum(col("v")).as("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == full && got == Map("a" -> ((2L, 60L)), "b" -> ((2L, 55L))),
      s"incremental $got != full $full")
  }

  test("maintainAgg: plans a single union-fed aggregation, no join; rejects bad base") {
    val base = Seq(("a", 2L, 30L)).toDF("g", "cnt", "v")
    val diff = Seq((1L, "U", "a", 10L, "b", 15L))
      .toDF("k", "change_type", "old_g", "old_v", "new_g", "new_v")
    val plan = ChangeCapture.maintainAgg(base, diff, Seq("g"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"maintainAgg must not join:\n${plan.take(2000)}")
    val n = "Exchange".r.findAllIn(plan).length
    assert(n == 1, s"expected one exchange, got $n:\n${plan.take(2000)}")
    val err = intercept[IllegalArgumentException] {
      ChangeCapture.maintainAgg(base.drop("cnt"), diff, Seq("g"), Seq("v"))
    }
    assert(err.getMessage.contains("cnt"))
  }

  test("scd2: rejects reserved output names already present") {
    val df = Seq((1L, 1L, "a", 0L)).toDF("k", "ts", "v", "valid_from")
    val err = intercept[IllegalArgumentException] {
      ChangeCapture.scd2(df, Seq("k"), "ts", Seq("v"))
    }
    assert(err.getMessage.contains("valid_from"))
  }

  test("snapshotAt: last change at-or-before wins; later-born keys absent; equals scd2 filter") {
    // key 1: a@10, b@20, c@30; key 2: born at 25. As of t=20: key 1
    // is b (the boundary change itself), key 2 absent.
    val log = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"),
      (2L, 25L, 4L, "x"))
      .toDF("k", "ts", "id", "v")
    val snap = ChangeCapture.snapshotAt(log, Seq("k"), "ts", Seq("v"), Seq("id"),
        asOf = lit(20L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(snap == Set((1L, "b", 20L)), s"wrong snapshot: $snap")
    // equivalence: filtering the scd2 history at the same instant
    // yields the same (key, value) state
    val viaHistory = ChangeCapture.scd2(log, Seq("k"), "ts", Seq("v"), Seq("id"))
      .where(col("valid_from") <= 20L &&
        (col("valid_to").isNull || col("valid_to") > 20L))
      .select(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaHistory == snap.map(t => (t._1, t._2)),
      s"scd2-filter disagrees: $viaHistory vs $snap")
  }

  test("tombstoneDiff: I/U/D semantics, idempotent re-sends, tombstone-wins, null marker") {
    val baseline = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "v", "m")
    val batch = Seq(
      (1L, "a2", 11L, Some(false)), // present, changed        -> U
      (2L, "b", 20L, Some(false)),  // present, identical      -> dropped
      (3L, null, 0L, Some(true)),   // present, tombstone      -> D
      (5L, "e", 50L, Some(false)),  // absent, upsert          -> I
      (6L, null, 0L, Some(true)),   // absent, tombstone       -> dropped
      (4L, "dd", 44L, Some(false)), // also tombstoned below:
      (4L, null, 0L, Some(true)),   //   tombstone wins        -> D
      (7L, "g", 70L, None))         // null marker reads false -> I
      .toDF("k", "v", "m", "deleted")
    val got = ChangeCapture.tombstoneDiff(batch, baseline,
        Seq("k"), Seq("v", "m"), "deleted")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString).orNull, Option(r.get(4)).map(_.toString).orNull))
      .toSet
    assert(got == Set(
      (1L, "U", "a", "a2"),
      (3L, "D", "c", null),
      (4L, "D", "d", null),
      (5L, "I", null, "e"),
      (7L, "I", null, "g")), s"wrong diff: $got")
  }

  test("tombstoneDiff orderCols: multi-change-per-key batch compacts to last write") {
    val baseline = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "m")
    val batch = Seq(
      // key 1: three changes; last (off=3) wins -> U a->a3
      (1L, "a1", 11L, false, 1L),
      (1L, "a2", 12L, false, 2L),
      (1L, "a3", 13L, false, 3L),
      // key 2: delete then LATER re-insert -> the re-insert wins (U)
      (2L, null, 0L, true, 1L),
      (2L, "b2", 22L, false, 2L),
      // key 3: insert then later delete; absent from baseline -> dropped
      (3L, "c", 30L, false, 1L),
      (3L, null, 0L, true, 2L))
      .toDF("k", "v", "m", "deleted", "off")
    val got = ChangeCapture.tombstoneDiff(batch, baseline,
        Seq("k"), Seq("v", "m"), "deleted", orderCols = Seq("off"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString).orNull, Option(r.get(4)).map(_.toString).orNull))
      .toSet
    assert(got == Set(
      (1L, "U", "a", "a3"),
      (2L, "U", "b", "b2")), s"wrong compacted diff: $got")
    // exactly one retract/add pair per key: maintainAgg stays exact
    val baseAgg = baseline.groupBy(lit("all").as("g"))
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("m"))
      .select(col("g"), col("cnt"), col("m"))
    val diff = ChangeCapture.tombstoneDiff(batch, baseline,
      Seq("k"), Seq("v", "m"), "deleted", orderCols = Seq("off"))
      .withColumn("old_g", when(col("old_m").isNotNull, lit("all")))
      .withColumn("new_g", when(col("new_m").isNotNull, lit("all")))
    val refreshed = ChangeCapture.maintainAgg(baseAgg, diff, Seq("g"), Seq("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // final state: 1->13, 2->22
    assert(refreshed == Set(("all", 2L, 35L)), s"wrong refresh: $refreshed")
  }

  test("snapshotAtCheckpointed: null keys collapse like snapshotAt's groupBy") {
    val log = Seq(
      (Some(1L), 10L, 1L, "a"), (Some(1L), 30L, 2L, "b"),
      (None, 10L, 3L, "n1"), (None, 30L, 4L, "n2"))
      .toDF("k", "ts", "id", "v")
    val ck = ChangeCapture.snapshotAt(log, Seq("k"), "ts", Seq("v"), Seq("id"),
      asOf = lit(20L))
    val got = ChangeCapture.snapshotAtCheckpointed(ck, log, Seq("k"), "ts",
      Seq("v"), Seq("id"), checkpointTs = lit(20L), asOf = lit(40L))
    val want = ChangeCapture.snapshotAt(log, Seq("k"), "ts", Seq("v"), Seq("id"),
      asOf = lit(40L))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"null-keyed checkpoint+delta diverged: ${got.collect().toSeq} vs ${want.collect().toSeq}")
    // one row for the null key, carrying the fresh image
    val nullRows = got.where(col("k").isNull).collect()
    assert(nullRows.length == 1 && nullRows.head.getString(1) == "n2",
      s"null key must surface once with the delta image: ${nullRows.toSeq}")
  }

  test("tombstoneDiff feeds maintainAgg: deletes retract, refresh equals full recompute") {
    val baseline = Seq((1L, "g1", 100L), (2L, "g1", 200L), (3L, "g2", 300L),
      (4L, "g2", 400L)).toDF("k", "g", "m")
    // delete key 1; move key 3 to g1 with a new measure; insert key 5
    val batch = Seq(
      (1L, null.asInstanceOf[String], 0L, true),
      (3L, "g1", 350L, false),
      (5L, "g2", 500L, false)).toDF("k", "g", "m", "deleted")
    val baseAgg = baseline.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("m"))
    val diff = ChangeCapture.tombstoneDiff(batch, baseline, Seq("k"), Seq("g", "m"), "deleted")
    val got = ChangeCapture.maintainAgg(baseAgg, diff, Seq("g"), Seq("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // final state: 2->g1/200, 3->g1/350, 4->g2/400, 5->g2/500
    assert(got == Set(("g1", 2L, 550L), ("g2", 2L, 900L)), s"wrong refresh: $got")
  }

  test("snapshotAtCheckpointed: equals full replay; scans only the delta; empty delta = checkpoint") {
    // key 1 changes on both sides of the checkpoint; key 2 only
    // before; key 3 is born after; key 4 changes after asOf
    val log = Seq(
      (1L, 10L, 1L, "a"), (1L, 30L, 2L, "b"),
      (2L, 15L, 3L, "x"),
      (3L, 25L, 4L, "m"),
      (4L, 50L, 5L, "z"), (1L, 50L, 6L, "late"))
      .toDF("k", "ts", "id", "v")
    val ck = ChangeCapture.snapshotAt(log, Seq("k"), "ts", Seq("v"), Seq("id"),
      asOf = lit(20L))
    val got = ChangeCapture.snapshotAtCheckpointed(ck, log, Seq("k"), "ts",
      Seq("v"), Seq("id"), checkpointTs = lit(20L), asOf = lit(40L))
    val want = ChangeCapture.snapshotAt(log, Seq("k"), "ts", Seq("v"), Seq("id"),
      asOf = lit(40L))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"checkpoint+delta diverged: ${got.collect().toSeq} vs ${want.collect().toSeq}")
    // the replay volume is the delta, not the history: only rows in
    // (20, 40] survive the pre-aggregation filter
    val replayed = log.where(col("ts") > 20L && col("ts") <= 40L).count()
    assert(replayed == 2L && log.count() == 6L,
      s"delta should be 2 of 6 rows, got $replayed")
    // asOf == checkpointTs: the delta is empty and the checkpoint
    // passes through byte-identically
    val same = ChangeCapture.snapshotAtCheckpointed(ck, log, Seq("k"), "ts",
      Seq("v"), Seq("id"), checkpointTs = lit(20L), asOf = lit(20L))
    assert(same.exceptAll(ck).isEmpty && ck.exceptAll(same).isEmpty,
      "empty delta must reproduce the checkpoint")
  }
}
