package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: snapshot diffing and slowly-changing-
  * dimension (type 2) history. These are the two operators every
  * warehouse ingest path runs daily — "what changed since yesterday's
  * load" and "turn a changelog into validity intervals".
  *
  * Both are single-shuffle plans: snapshotDiff is one full outer hash
  * join on the key; scd2 is one hash partition on the key feeding two
  * window passes over the SAME (partition, order) — Catalyst plans one
  * exchange and one sort, reused. No collect, no iteration; both
  * survive 100x scale as long as the key is not pathologically skewed
  * (and a skewed dimension key is a data bug, not a plan bug).
  */
object ChangeCapture {

  /** Diff two snapshots of the same table: one row per key whose
    * presence or compared attributes changed, tagged I (in new only),
    * D (in old only) or U (both, attributes differ). Unchanged rows
    * are dropped — at 100 TB the diff is the small output, the
    * snapshots are the big inputs, and nothing but the join shuffles.
    *
    * Comparison is null-safe (`<=>` on the attr struct). Output:
    * key cols, change_type, old_/new_-prefixed compare cols (null on
    * the absent side).
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")

    val o = oldDf.select(
      struct(keyCols.map(col): _*).as("k"),
      struct(compareCols.map(col): _*).as("old_v"))
    val n = newDf.select(
      struct(keyCols.map(col): _*).as("k"),
      struct(compareCols.map(col): _*).as("new_v"))

    val joined = o.join(n, Seq("k"), "full_outer")
    val changeType = when(col("old_v").isNull, lit("I"))
      .when(col("new_v").isNull, lit("D"))
      .when(!(col("old_v") <=> col("new_v")), lit("U"))

    joined
      .withColumn("change_type", changeType)
      .where(col("change_type").isNotNull)
      .select(
        keyCols.map(c => col(s"k.$c").as(c)) ++
          Seq(col("change_type")) ++
          compareCols.map(c => col(s"old_v.$c").as(s"old_$c")) ++
          compareCols.map(c => col(s"new_v.$c").as(s"new_$c")): _*)
  }

  /** Build type-2 history from a changelog: per key, collapse
    * consecutive rows whose tracked attributes did not change, then
    * assign each surviving version `valid_from` = its change time and
    * `valid_to` = the next version's change time (null while current).
    *
    * Ordering within a key is (tsCol, tieCols...) — pass a unique id
    * as the tie-break so equal-timestamp changes resolve
    * deterministically. The attr comparison is null-safe.
    *
    * Output: key cols, attr cols, valid_from (the ts column's type),
    * valid_to, is_current (1L/0L — integer for cross-engine hashing).
    */
  def scd2(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val reserved = Seq("valid_from", "valid_to", "is_current")
    val clash = reserved.filter(changes.columns.contains)
    require(clash.isEmpty, s"input must not already carry ${clash.mkString(", ")}")

    val orderCols = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val attrs = struct(attrCols.map(col): _*)

    // First row per key: lag is null, struct <=> null is false, so
    // !(...) keeps it — no special case needed.
    val kept = changes
      .withColumn("_chg", !(attrs <=> lag(attrs, 1).over(w)))
      .where(col("_chg"))

    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    kept
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", when(col("valid_to").isNull, 1L).otherwise(0L))
      .select((keyCols ++ attrCols ++ reserved).map(col): _*)
  }

  /** Time-travel snapshot: reconstruct each key's state AS OF a
    * point in time directly from a changelog — "what did the catalog
    * look like last Tuesday" without storing daily copies. Per key:
    * keep changes at or before `asOf`, take the LAST one by
    * (tsCol, tieCols...) — a single max-struct aggregation
    * (map-side combined, one shuffle on the key), never a window
    * sort over full history. Keys whose first change is after
    * `asOf` are absent, exactly as they were absent then.
    *
    * The struct max orders by (ts, ties..., attrs); a unique tie
    * column guarantees attrs are never consulted. Output: key cols,
    * attr cols, and `as_of_ts` — the change time the state comes
    * from. Equivalent to filtering [[scd2]] on
    * valid_from <= asOf < valid_to, but skips building history
    * (LinkageSpec asserts the equivalence).
    */
  def snapshotAt(changes: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String], tieCols: Seq[String], asOf: Column): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "keyCols and attrCols must be non-empty")
    val ordered = struct((tsCol +: tieCols).map(col) ++ attrCols.map(col): _*)
    changes.where(col(tsCol) <= asOf)
      .groupBy(keyCols.map(col): _*)
      .agg(max(ordered).as("_last"))
      .select(keyCols.map(col) ++
        attrCols.map(c => col(s"_last.`$c`").as(c)) :+
        col(s"_last.`$tsCol`").as("as_of_ts"): _*)
  }

  /** Tombstone-aware changelog diff — the operator that closes the
    * upsert-stream blind spot: an upsert feed observes presence, not
    * absence ([[graft.streaming.StreamingOps.diffStream]]), so a
    * deleted key would simply stop arriving and the downstream
    * aggregate would never retract it. The standard CDC fix (Debezium
    * op=d, Kafka compacted-topic null values) is an explicit DELETE
    * MARKER riding the same feed; this operator turns one
    * marker-bearing batch into [[snapshotDiff]]-shaped I/U/D rows
    * against a baseline, so [[maintainAgg]] retracts deletes exactly
    * like any other change.
    *
    * Semantics per batch row, decided against `baseline`:
    *  - marker false, key absent from baseline  -> I
    *  - marker false, key present, attrs differ -> U
    *  - marker false, key present, attrs equal  -> no row (idempotent re-send)
    *  - marker true,  key present               -> D (old image from the baseline)
    *  - marker true,  key absent                -> no row (idempotent re-delete)
    * A key carried BOTH ways in one batch resolves tombstone-wins (a
    * delete marker is the stronger, later-intent signal — same rule as
    * compacted-topic null precedence); a null marker reads as false.
    * Tombstone rows' attr columns are ignored — delete markers carry
    * a key, not an image.
    *
    * Multiple rows per key: real Debezium / compacted-topic micro-
    * batches routinely carry several changes for one key. Pass
    * `orderCols` (an event-time / offset column, non-null) and the
    * batch is COMPACTED to the last write per key first — one
    * max-struct aggregation, map-side combined — so a delete followed
    * by a later re-insert correctly surfaces the re-insert, and
    * [[maintainAgg]] sees exactly one retract/add pair per key. Ties
    * on `orderCols` resolve tombstone-wins. With `orderCols` empty
    * the input must carry AT MOST ONE NON-TOMBSTONE ROW PER KEY
    * (tombstone-wins resolves the delete-vs-upsert collision, but two
    * distinct upserts of one key are unordered and would fan the diff
    * out); feeds that can violate this must pass `orderCols`.
    *
    * Scale shape: both sides of the baseline are scoped FIRST by
    * left-semi joins on the batch's keys, so per-batch cost follows
    * the BATCH size, never the baseline size — at 100 TB the baseline
    * is the big side and only touched keys' rows ever join (the same
    * contract as diffStream). Output is valid [[maintainAgg]] input.
    */
  def tombstoneDiff(
      batch: DataFrame,
      baseline: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      deleteCol: String,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    require(batch.columns.contains(deleteCol),
      s"batch lacks the delete-marker column '$deleteCol'")
    // the compaction struct is (orderCols, _del, compareCols) by NAME —
    // a collision would make the `_w.<field>` reads ambiguous or wrong
    require(orderCols.intersect(compareCols).isEmpty,
      s"orderCols and compareCols must be disjoint, both contain " +
        orderCols.intersect(compareCols).mkString(", "))
    require(!(orderCols ++ compareCols).contains("_del"),
      "'_del' is reserved by tombstoneDiff's compaction struct")
    val isDel = coalesce(col(deleteCol).cast("boolean"), lit(false))
    // last-write-per-key compaction: order by (orderCols, marker) so
    // exact order ties resolve tombstone-wins; attrs trail only to
    // make the pick deterministic when even the marker ties
    val b =
      if (orderCols.isEmpty) batch
      else {
        val w = struct(orderCols.map(col) ++
          Seq(isDel.as("_del")) ++ compareCols.map(col): _*)
        batch.groupBy(keyCols.map(col): _*).agg(max(w).as("_w"))
          .select(keyCols.map(col) ++
            Seq(col("_w._del").as(deleteCol)) ++
            compareCols.map(c => col(s"_w.`$c`").as(c)): _*)
      }
    val delKeys = b.where(isDel).select(keyCols.map(col): _*).distinct()
    // tombstone-wins: an upsert of a key the same batch also deletes is void
    val ups = b.where(!isDel).drop(deleteCol)
      .join(delKeys, keyCols, "left_anti")
    val upBase = baseline.join(
      ups.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")
    // every scoped baseline key is in ups, so this emits I/U only
    val upDiff = snapshotDiff(upBase, ups, keyCols, compareCols)
    val delDiff = baseline.join(delKeys, keyCols, "left_semi")
      .select(keyCols.map(col) ++
        Seq(lit("D").as("change_type")) ++
        compareCols.map(c => col(c).as(s"old_$c")) ++
        compareCols.map(c =>
          lit(null).cast(baseline.schema(c).dataType).as(s"new_$c")): _*)
    upDiff.unionByName(delDiff)
  }

  /** Checkpointed time travel — [[snapshotAt]] without the full-
    * changelog replay: given a MATERIALIZED snapshot taken at
    * `checkpointTs` (a persisted [[snapshotAt]] result — key cols,
    * attr cols, `as_of_ts`) and the raw changelog, reconstruct the
    * state as of `asOf >= checkpointTs` by replaying ONLY the delta
    * in (checkpointTs, asOf]. Per key the answer is the delta's last
    * change if one exists, else the checkpoint row — delta rows are
    * strictly newer than every checkpoint row's change time, so the
    * preference needs no tie-break, and keys first seen inside the
    * delta appear exactly as [[snapshotAt]] would surface them.
    *
    * This is the plan that survives a growing changelog: full replay
    * costs O(|history|) per query and the history only ever grows,
    * while checkpoint + delta costs O(|snapshot| + |delta|) — with
    * the changelog partitioned by `tsCol`, partition pruning makes
    * the delta scan read only the (checkpointTs, asOf] files
    * (the Delta/Iceberg checkpoint-plus-log shape). One filtered
    * max-struct aggregation + one full-outer hash join on the key.
    *
    * Byte-equivalence to the full replay is oracle-proved (q186
    * hash-matches q180's full-replay oracle) and LinkageSpec asserts
    * the delta row count is the pruned one.
    */
  def snapshotAtCheckpointed(
      checkpoint: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieCols: Seq[String],
      checkpointTs: Column,
      asOf: Column): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "keyCols and attrCols must be non-empty")
    val outCols = attrCols :+ "as_of_ts"
    val missing = outCols.filterNot(checkpoint.columns.contains)
    require(missing.isEmpty,
      s"checkpoint is not a snapshotAt materialization — lacks ${missing.mkString(", ")}")
    val delta = changes.where(col(tsCol) > checkpointTs)
    val deltaLast = snapshotAt(delta, keyCols, tsCol, attrCols, tieCols, asOf)
    val ckR = checkpoint.select(keyCols.map(c => col(c).as(s"_ck_k_$c")) ++
      outCols.map(c => col(c).as(s"_ck_$c")): _*)
    val dR = deltaLast.select(keyCols.map(c => col(c).as(s"_d_k_$c")) ++
      outCols.map(c => col(c).as(s"_d_$c")): _*)
    // null-safe key equality (<=>): snapshotAt's groupBy collapses a
    // null key into ONE group, so the merge join must match null keys
    // too — a using-columns full outer would surface a null-keyed
    // checkpoint row AND its delta row (stale + fresh)
    val cond = keyCols.map(c => col(s"_ck_k_$c") <=> col(s"_d_k_$c"))
      .reduce(_ && _)
    // row presence decides the winner (as_of_ts is never null on a
    // present row; an attr itself may be legitimately null)
    ckR.join(dR, cond, "full_outer")
      .select(keyCols.map(c =>
        when(col("_d_as_of_ts").isNotNull, col(s"_d_k_$c"))
          .otherwise(col(s"_ck_k_$c")).as(c)) ++
        outCols.map(c =>
          when(col("_d_as_of_ts").isNotNull, col(s"_d_$c"))
            .otherwise(col(s"_ck_$c")).as(c)): _*)
  }

  /** Incremental aggregate maintenance (materialized-view refresh):
    * given the previous grouped aggregate of a fact table and the
    * [[snapshotDiff]] of the facts since that aggregate was built,
    * produce the NEW aggregate without rescanning the facts — the
    * plan every warehouse runs nightly on aggregates too expensive to
    * recompute. At 100 TB the fact scan is the dominant cost; this
    * plan touches only the (small) previous aggregate and the (small)
    * diff: D/U rows retract their old contribution, I/U rows add
    * their new one, and a group migration in a U row is just a
    * retraction in one group plus an addition in another.
    *
    * Contract: `baseAgg` carries `groupCols`, a `cnt` row count, and
    * one LONG sum per measure (integer grids — cents/micros — so
    * incremental totals are exact and engine-independent; float sums
    * would drift from a full recompute by addition order). `diff` is
    * [[snapshotDiff]] output whose compareCols included every group
    * and measure column (rows with unchanged group+measures carry
    * zero net delta and may simply be absent). Groups whose count
    * reaches zero are dropped, matching a full recompute.
    *
    * Plan: two narrow projections of the diff unioned with the base
    * aggregate, then ONE hash aggregation on the group key — a single
    * shuffle whose volume is |baseAgg| + 2|diff|, no join anywhere.
    *
    * Non-retractable aggregates (COUNT DISTINCT, MIN, MAX — a delete
    * cannot tell you what remains) maintain their (group, value)
    * SUPPORT table with this same operator at (group ++ value) grain
    * and no measures, then read the aggregate off the surviving
    * support rows (count / min / max of `value` per group) — q169.
    */
  def maintainAgg(
      baseAgg: DataFrame,
      diff: DataFrame,
      groupCols: Seq[String],
      measureCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(!groupCols.contains("cnt") && !measureCols.contains("cnt"),
      "'cnt' is the reserved row-count column — rename the clashing group/measure column")
    val need = groupCols ++ ("cnt" +: measureCols)
    val missing = need.filterNot(baseAgg.columns.contains)
    require(missing.isEmpty, s"baseAgg lacks columns ${missing.mkString(", ")}")

    def contrib(prefix: String, sign: Long, types: Seq[String]): DataFrame =
      diff.where(col("change_type").isin(types: _*))
        .select(groupCols.map(c => col(s"$prefix$c").as(c)) ++
          (lit(sign).as("cnt") +:
            measureCols.map(c => (col(s"$prefix$c").cast("long") * sign).as(c))): _*)

    val retract = contrib("old_", -1L, Seq("D", "U"))
    val add = contrib("new_", 1L, Seq("I", "U"))
    baseAgg.select(need.map(col): _*)
      .unionByName(retract).unionByName(add)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        measureCols.map(c => sum(col(c)).as(c)): _*)
      .where(col("cnt") > 0)
  }
}
