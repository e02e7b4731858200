package graft.queriesExt

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ChangeCapture, Linkage}
import graft.queriesRelational.RelationalQueries.Q

/** Entity-resolution and change-data-capture queries: fuzzy matching
  * (Linkage), snapshot diffing and SCD2 history (ChangeCapture).
  */
object LinkageQueries {

  /** Fuzzy name matching on part names (Linkage.fuzzyPairs): every
    * pair of distinct p_name values within Levenshtein distance 2,
    * with support counts — the catalog-cleanup query ("red bolt" vs
    * "old bolt"). The Spark side blocks candidates by length band
    * (lossless for edit distance); the oracle states the naive
    * all-pairs definition, so the hash match proves the blocking
    * drops nothing.
    */
  private val q160 = Q("q160_fuzzy_match", (s, dir) => {
    Linkage.fuzzyPairs(Tables.load(s, dir, "part"), "p_name", maxDist = 2)
      .orderBy(col("name_a"), col("name_b"))
  }, Some("""
    WITH v AS (
      SELECT p_name AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM part GROUP BY p_name)
    SELECT a.v AS name_a, b.v AS name_b,
           CAST(levenshtein(a.v, b.v) AS BIGINT) AS dist,
           a.cnt AS cnt_a, b.cnt AS cnt_b
    FROM v a JOIN v b ON a.v < b.v
    WHERE levenshtein(a.v, b.v) BETWEEN 1 AND 2
    ORDER BY name_a, name_b"""))

  /** Snapshot diff (ChangeCapture.snapshotDiff): yesterday's vs
    * today's customer load, one row per insert/update/delete. The two
    * snapshots are carved deterministically from the same table
    * (custkey residues decide membership; balances shift +100 on the
    * %5 residue) so both engines build byte-identical inputs.
    */
  private val q161 = Q("q161_snapshot_diff", (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val oldSnap = c.where(col("c_custkey") % 7 =!= 0)
    val newSnap = c.where(col("c_custkey") % 11 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
    ChangeCapture.snapshotDiff(oldSnap, newSnap,
        keyCols = Seq("c_custkey"),
        compareCols = Seq("c_name", "c_acctbal", "c_mktsegment"))
      .orderBy(col("c_custkey"))
  }, Some("""
    WITH oldd AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 7 <> 0),
    newd AS (
      SELECT c_custkey, c_name,
             CAST(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
                       ELSE c_acctbal END AS DOUBLE) AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 11 <> 0)
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'I'
                WHEN n.c_custkey IS NULL THEN 'D'
                ELSE 'U' END AS change_type,
           o.c_name AS old_c_name, o.c_acctbal AS old_c_acctbal,
           o.c_mktsegment AS old_c_mktsegment,
           n.c_name AS new_c_name, n.c_acctbal AS new_c_acctbal,
           n.c_mktsegment AS new_c_mktsegment
    FROM oldd o FULL JOIN newd n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_name IS DISTINCT FROM n.c_name
       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
       OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
    ORDER BY c_custkey"""))

  /** SCD2 history (ChangeCapture.scd2): each user's event stream as a
    * changelog of their latest event_type — consecutive repeats
    * collapse, every surviving version gets [valid_from, valid_to)
    * in integer epoch micros, the open interval is flagged current.
    * (ts, event_id) ordering makes equal-timestamp changes
    * deterministic in both engines.
    */
  private val q162 = Q("q162_scd2_history", (s, dir) => {
    val e = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    ChangeCapture.scd2(e, keyCols = Seq("user_id"), tsCol = "ts_us",
        attrCols = Seq("event_type"), tieCols = Seq("event_id"))
      .orderBy(col("user_id"), col("valid_from"), col("event_type"))
  }, Some("""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
    o AS (
      SELECT user_id, event_type, ts_us, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      FROM e),
    c AS (
      SELECT user_id, event_type, ts_us, event_id FROM o
      WHERE prev IS NULL OR prev <> event_type),
    h AS (
      SELECT user_id, event_type, ts_us AS valid_from,
             lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to
      FROM c)
    SELECT user_id, event_type, valid_from, valid_to,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM h ORDER BY user_id, valid_from, event_type"""))

  /** Best-match canonicalization (Linkage.linkBest): every part name
    * mapped to its nearest name in the canonical subset (parts on the
    * %3 key residue) within distance 2 — catalog members map to
    * themselves at 0, unmatched names surface with nulls. The Spark
    * side blocks by length band; the oracle is the naive theta-join
    * definition, so the hash match again proves blocking is lossless.
    */
  private val q164 = Q("q164_link_canonical", (s, dir) => {
    val part = Tables.load(s, dir, "part")
    Linkage.linkBest(part, part.where(col("p_partkey") % 3 === 0),
        "p_name", "p_name", maxDist = 2)
      .orderBy(col("value"))
  }, Some("""
    WITH d AS (
      SELECT p_name AS value, CAST(count(*) AS BIGINT) AS cnt
      FROM part GROUP BY p_name),
    c AS (SELECT DISTINCT p_name AS m FROM part WHERE p_partkey % 3 = 0),
    cand AS (
      SELECT d.value, c.m, CAST(levenshtein(d.value, c.m) AS BIGINT) AS dist
      FROM d JOIN c ON levenshtein(d.value, c.m) <= 2),
    best AS (
      SELECT value, m, dist,
             row_number() OVER (PARTITION BY value ORDER BY dist, m) AS rn
      FROM cand)
    SELECT d.value, d.cnt, b.m AS match, b.dist
    FROM d LEFT JOIN (SELECT value, m, dist FROM best WHERE rn = 1) b USING (value)
    ORDER BY value"""))

  /** Incremental aggregate maintenance (ChangeCapture.maintainAgg):
    * the per-segment (count, balance-cents) aggregate of yesterday's
    * customer snapshot, refreshed to today's using ONLY the snapshot
    * diff — retract old contributions of D/U rows, add new ones of
    * I/U rows, one hash aggregation, no fact rescan. Today's load
    * inserts/deletes by key residue, shifts %5 balances, and MIGRATES
    * %13 customers to AUTOMOBILE (exercising cross-group updates).
    * The oracle recomputes the aggregate from scratch on today's
    * snapshot — it never sees the base aggregate or the diff — so the
    * hash match proves incremental refresh == full recompute.
    */
  private val q165 = Q("q165_incremental_agg", (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("c_custkey"), col("c_mktsegment"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("bal_cents"))
    val oldSnap = snap(c.where(col("c_custkey") % 7 =!= 0))
    val newSnap = snap(c.where(col("c_custkey") % 11 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 13 === 0, lit("AUTOMOBILE"))
          .otherwise(col("c_mktsegment"))))
    val base = oldSnap.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), sum(col("bal_cents")).as("bal_cents"))
    val diff = ChangeCapture.snapshotDiff(oldSnap, newSnap,
      keyCols = Seq("c_custkey"), compareCols = Seq("c_mktsegment", "bal_cents"))
    ChangeCapture.maintainAgg(base, diff,
        groupCols = Seq("c_mktsegment"), measureCols = Seq("bal_cents"))
      .orderBy(col("c_mktsegment"))
  }, Some("""
    WITH newd AS (
      SELECT CASE WHEN c_custkey % 13 = 0 THEN 'AUTOMOBILE'
                  ELSE c_mktsegment END AS c_mktsegment,
             CAST(floor(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
                             ELSE c_acctbal END * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer WHERE c_custkey % 11 <> 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(bal_cents) AS BIGINT) AS bal_cents
    FROM newd GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** End-to-end entity resolution: the q160 fuzzy pairs are EDGES,
    * and transitive closure merges them into entity clusters with a
    * deterministic canonical value (the cluster's minimum) — the step
    * pairwise matching alone cannot do ("red bolt"~"ted bolt" and
    * "ted bolt"~"tad bolt" must land in ONE entity even though
    * "red"~"tad" exceeds the distance budget). Spark side composes
    * Linkage.fuzzyPairs (lossless length-band blocking) with
    * Dedup.connectedComponents (min-label propagation + pointer
    * jumping, O(log diameter) rounds of kilobyte label frames — the
    * q75 machinery, id-type generic so string values need no
    * surrogate keys). The oracle recomputes the closure with a
    * recursive CTE over the naive all-pairs edge set.
    */
  private val q168 = Q("q168_entity_clusters", (s, dir) => {
    val pairs = Linkage.fuzzyPairs(Tables.load(s, dir, "part"), "p_name", maxDist = 2)
      .select(col("name_a").as("id1"), col("name_b").as("id2"))
    graft.operators.Dedup.connectedComponents(pairs)
      .select(col("id").as("value"), col("cluster_rep").as("canonical"),
        col("cluster_size"))
      .orderBy(col("value"))
  }, Some("""
    WITH RECURSIVE v AS (SELECT p_name AS v FROM part GROUP BY p_name),
    pairs AS (
      SELECT a.v AS id1, b.v AS id2
      FROM v a JOIN v b ON a.v < b.v
      WHERE levenshtein(a.v, b.v) BETWEEN 1 AND 2),
    undirected AS (
      SELECT id1 AS s, id2 AS d FROM pairs
      UNION ALL SELECT id2, id1 FROM pairs),
    nodes AS (SELECT DISTINCT s AS id FROM undirected),
    reach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT u.s AS id, reach.r FROM undirected u JOIN reach ON reach.id = u.d),
    comp AS (SELECT id AS value, min(r) AS canonical FROM reach GROUP BY id)
    SELECT value, canonical,
           CAST(count(*) OVER (PARTITION BY canonical) AS BIGINT) AS cluster_size
    FROM comp ORDER BY value"""))

  /** Incremental COUNT(DISTINCT) maintenance: distinct counts are the
    * classically NON-retractable aggregate (a delete cannot tell you
    * whether the value still occurs), so the standard IVM move is to
    * maintain the (group, value) SUPPORT table instead — which is
    * just [[ChangeCapture.maintainAgg]] at (group, value) grain with
    * no measures — and read distinct-count as the surviving support
    * rows. The refresh cost follows the diff and the support table
    * (bounded by |group| x |distinct values|, tiny next to the
    * facts); the fact table is never rescanned. Here: distinct
    * nations and customer counts per market segment across the q161
    * snapshot transition, oracle recomputed from scratch on the new
    * snapshot alone.
    */
  private val q169 = Q("q169_incremental_distinct", (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    val oldSnap = snap(c.where(col("c_custkey") % 7 =!= 0))
    val newSnap = snap(c.where(col("c_custkey") % 11 =!= 0)
      .withColumn("c_nationkey",
        when(col("c_custkey") % 13 === 0, lit(77L)).otherwise(col("c_nationkey"))))
    val support = oldSnap.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"))
    val diff = ChangeCapture.snapshotDiff(oldSnap, newSnap,
      keyCols = Seq("c_custkey"), compareCols = Seq("c_mktsegment", "c_nationkey"))
    ChangeCapture.maintainAgg(support, diff,
        groupCols = Seq("c_mktsegment", "c_nationkey"), measureCols = Nil)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("distinct_nations"), sum(col("cnt")).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }, Some("""
    WITH newd AS (
      SELECT c_mktsegment,
             CASE WHEN c_custkey % 13 = 0 THEN 77 ELSE c_nationkey END AS c_nationkey
      FROM customer WHERE c_custkey % 11 <> 0)
    SELECT c_mktsegment,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS distinct_nations,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM newd GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Time-travel snapshot (ChangeCapture.snapshotAt): every user's
    * event_type state as of 2024-01-15 00:00 UTC, reconstructed
    * straight from the event changelog — one max-struct aggregation,
    * no history build, no window sort. Users whose first event is
    * later are absent. The oracle takes the same last-at-or-before
    * row per key via a DESC row_number.
    */
  private val q180 = Q("q180_snapshot_at", (s, dir) => {
    val e = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    ChangeCapture.snapshotAt(e, keyCols = Seq("user_id"), tsCol = "ts_us",
        attrCols = Seq("event_type"), tieCols = Seq("event_id"),
        asOf = lit(1705276800000000L))
      .orderBy(col("user_id"))
  }, Some("""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      FROM events WHERE epoch_us(ts) <= 1705276800000000),
    r AS (
      SELECT user_id, event_type, ts_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts_us DESC, event_id DESC) AS rn
      FROM e)
    SELECT user_id, event_type, ts_us AS as_of_ts
    FROM r WHERE rn = 1 ORDER BY user_id"""))

  /** Tombstone-bearing CDC refresh (ChangeCapture.tombstoneDiff +
    * maintainAgg): one changelog batch carries BOTH upserts (%5 keys,
    * balance +100 — updates where the key exists, inserts where it
    * does not) and delete markers (%11 keys), and the maintained
    * segment aggregate must retract the deletes — the blind spot a
    * plain upsert feed cannot express. A key divisible by 55 is
    * carried both ways, exercising the tombstone-wins rule. The
    * oracle recomputes the aggregate from scratch on the post-
    * changelog state — it never sees the base aggregate, the diff, or
    * the precedence rule — so the hash match proves delete
    * retraction end-to-end.
    */
  private val q185 = Q("q185_tombstone_cdc", (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    def cents(b: org.apache.spark.sql.Column) =
      floor(b * 100 + lit(0.5)).cast("long")
    val baseline = c.where(col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal")).as("bal_cents"))
    val tombs = c.where(col("c_custkey") % 11 === 0)
      .select(col("c_custkey"), lit(null).cast("string").as("c_mktsegment"),
        lit(null).cast("long").as("bal_cents"), lit(true).as("deleted"))
    val ups = c.where(col("c_custkey") % 5 === 0 &&
        (col("c_custkey") % 7 =!= 0 || col("c_custkey") % 3 === 0))
      .select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal") + 100.0).as("bal_cents"), lit(false).as("deleted"))
    val baseAgg = baseline.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), sum(col("bal_cents")).as("bal_cents"))
    val diff = ChangeCapture.tombstoneDiff(tombs.unionByName(ups), baseline,
      keyCols = Seq("c_custkey"), compareCols = Seq("c_mktsegment", "bal_cents"),
      deleteCol = "deleted")
    ChangeCapture.maintainAgg(baseAgg, diff,
        groupCols = Seq("c_mktsegment"), measureCols = Seq("bal_cents"))
      .orderBy(col("c_mktsegment"))
  }, Some("""
    WITH finalstate AS (
      SELECT c_mktsegment,
             CAST(floor(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
                             ELSE c_acctbal END * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer
      WHERE c_custkey % 11 <> 0
        AND (c_custkey % 7 <> 0
             OR (c_custkey % 3 = 0 AND c_custkey % 5 = 0)))
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(bal_cents) AS BIGINT) AS bal_cents
    FROM finalstate GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Checkpointed time travel (ChangeCapture.snapshotAtCheckpointed):
    * the q180 as-of-2024-01-15 state, reconstructed from a
    * materialized 2024-01-08 checkpoint plus ONLY the week's delta —
    * never the full changelog. The oracle is q180's full-replay
    * definition verbatim, so the hash match proves checkpoint + delta
    * replay is byte-equivalent to replaying all of history
    * (LinkageSpec separately asserts the replayed-row count drops to
    * the delta).
    */
  private val q186 = Q("q186_snapshot_checkpointed", (s, dir) => {
    val e = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val ckTs = 1704672000000000L // 2024-01-08 00:00 UTC
    val checkpoint = ChangeCapture.snapshotAt(e, keyCols = Seq("user_id"),
      tsCol = "ts_us", attrCols = Seq("event_type"), tieCols = Seq("event_id"),
      asOf = lit(ckTs))
    ChangeCapture.snapshotAtCheckpointed(checkpoint, e,
        keyCols = Seq("user_id"), tsCol = "ts_us",
        attrCols = Seq("event_type"), tieCols = Seq("event_id"),
        checkpointTs = lit(ckTs), asOf = lit(1705276800000000L))
      .orderBy(col("user_id"))
  }, Some("""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      FROM events WHERE epoch_us(ts) <= 1705276800000000),
    r AS (
      SELECT user_id, event_type, ts_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts_us DESC, event_id DESC) AS rn
      FROM e)
    SELECT user_id, event_type, ts_us AS as_of_ts
    FROM r WHERE rn = 1 ORDER BY user_id"""))

  val list: Seq[Q] = Seq(q160, q161, q162, q164, q165, q168, q169, q180,
    q185, q186)
}
