package graft.queriesExt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.FirehoseTransform
import graft.queriesRelational.RelationalQueries.Q

/** End-to-end pipeline correctness as an oracle query, plus the as-of
  * join pattern.
  */
object PipelineQueries {

  /** Build the flagship wire-format pipeline input: one CWL envelope
    * per user with their events as logEvents in event_id order
    * (shared by SparkEntry.entry and q63).
    */
  def envelopes(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    events
      .withColumn("ev", struct(
        col("event_id").cast("string").as("id"),
        (unix_timestamp(col("ts")) * 1000).as("timestamp"),
        concat(lit("Hello "), col("event_type"), lit(" "), col("props")).as("message")))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id").as("k"), col("ev").as("v")))).as("sorted"))
      .select(col("user_id"), expr("transform(sorted, x -> x.v)").as("logEvents"))
      .select(
        col("user_id"),
        struct(
          lit("DATA_MESSAGE").as("messageType"),
          lit("123456789012").as("owner"),
          lit("/ex-aws-firehose").as("logGroup"),
          concat(lit("user-"), col("user_id")).as("logStream"),
          array(lit("ex-aws-firehose")).as("subscriptionFilters"),
          col("logEvents").as("logEvents")).as("envelope"))
  }

  /** The WHOLE reference data path, oracle-checked: envelope framing
    * (to_json -> gzip -> base64) -> decode -> dispatch -> per-event
    * transform -> order-preserving re-assembly -> base64. The gzip leg
    * cancels inside the pipeline, so DuckDB can replicate the final
    * payload with string aggregation + to_base64 — an independent
    * engine confirming the full A3-A11 chain byte-for-byte.
    */
  private val q63 = Q("q63_pipeline_e2e", (s, dir) => {
    val framed = FirehoseTransform.frameRecords(
      envelopes(s, dir), col("user_id"), col("envelope"))
    FirehoseTransform.transform(framed)
      .select(col("recordId"), col("result"), col("data"))
      .orderBy(col("recordId"))
  }, Some("""
    SELECT CAST(user_id AS VARCHAR) AS recordId, 'Ok' AS result,
           to_base64(encode(string_agg(
             'Hell Yeah ' || event_type || ' ' || props || chr(10), ''
             ORDER BY event_id))) AS data
    FROM events GROUP BY user_id ORDER BY recordId"""))

  /** As-of join, composed per SURVEY.md §4 preference (a) — no custom
    * plan node needed: for every purchase event, the most recent click
    * by the same user at or before it. Union-tag + running last_value
    * over (user, time) — one shuffle on the user key, linear in events,
    * vs. a range-join formulation that explodes quadratically inside
    * hot keys.
    */
  private val q64 = Q("q64_asof_join", (s, dir) => {
    val events = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin("purchase", "click"))
      .withColumn("click_id", when(col("event_type") === "click", col("event_id")))
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("last_click_id"))
      .orderBy(col("purchase_id"))
  }, Some("""
    SELECT event_id AS purchase_id, user_id, last_click_id FROM (
      SELECT event_id, user_id, event_type,
             last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
      FROM events WHERE event_type IN ('purchase', 'click'))
    WHERE event_type = 'purchase' ORDER BY purchase_id"""))

  /** As-of join WITH tolerance (the merge_asof/kdb-aj feature): a
    * purchase matches its most recent prior click only within 30
    * minutes. Same one-shuffle union-tag composition as q64, through
    * the reusable [[graft.operators.Temporal.asofJoin]]; the oracle
    * replays the union-tagged window with the operator's exact
    * (ts, side, id) ordering and integer-microsecond tolerance gate.
    */
  private val q113 = Q("q113_asof_tolerance", (s, dir) => {
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.Temporal.asofJoin(purchases, clicks, "user_id", "user_id",
        "ts", "ts", tieBreak = "event_id", toleranceSec = Some(1800L))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof.event_id").as("click_id"))
      .orderBy(col("purchase_id"))
  }, Some("""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
      FROM events WHERE event_type IN ('purchase', 'click')),
    m AS (
      SELECT *,
             last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w AS last_click_id,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS last_click_ts
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN last_click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(last_click_ts) <= 1800 * 1000000
                THEN last_click_id END AS click_id
    FROM m WHERE side = 1 ORDER BY purchase_id"""))

  /** FORWARD as-of join: each purchase matched to the EARLIEST click
    * at-or-after it within 30 minutes (the "next event after" lookup).
    * Same operator, mirrored ordering — the oracle replays the DESC
    * window with the operator's exact (ts DESC, side, id DESC) order
    * and forward tolerance gate.
    */
  private val q124 = Q("q124_asof_forward", (s, dir) => {
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.Temporal.asofJoin(purchases, clicks, "user_id", "user_id",
        "ts", "ts", tieBreak = "event_id", toleranceSec = Some(1800L),
        direction = "forward")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof.event_id").as("click_id"))
      .orderBy(col("purchase_id"))
  }, Some("""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
      FROM events WHERE event_type IN ('purchase', 'click')),
    m AS (
      SELECT *,
             last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w AS next_click_id,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS next_click_ts
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, side, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN next_click_ts IS NOT NULL
                 AND epoch_us(next_click_ts) - epoch_us(ts) <= 1800 * 1000000
                THEN next_click_id END AS click_id
    FROM m WHERE side = 1 ORDER BY purchase_id"""))

  /** Composed round-6 curation pipeline: lexical-diversity filter
    * (token entropy + TTR) -> weighted sampling per language ->
    * deterministic train/val split — three operators from three
    * families chained through their real interfaces, hash-checked
    * end-to-end by one CTE stack (the q106 discipline applied to the
    * round-6 additions).
    */
  private val q137 = Q("q137_curate_sample_split", (s, dir) => {
    import graft.operators.{CorpusOps, TextAnalysis}
    val docs = Tables.load(s, dir, "documents")
    val stats = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
    val kept = docs.select(col("doc_id"), col("lang"))
      .join(stats.filter(col("entropy_unat") >= 3000000L && col("ttr_pm") >= 450L)
        .select(col("doc_id"), col("n_tokens")), "doc_id")
    val sampled = CorpusOps.weightedSample(kept, col("doc_id"), col("n_tokens"),
      col("lang"), k = 25)
    CorpusOps.assignSplit(sampled, col("doc_id"), Seq(("train", 0.9), ("val", 0.1)))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("sample_rank"), col("split"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    f AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
    d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS clc
          FROM f GROUP BY doc_id),
    st AS (SELECT doc_id, n_tokens,
                  (n_types * 1000) // n_tokens AS ttr_pm,
                  CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) - clc // n_tokens AS ent
           FROM d),
    kept AS (SELECT st.doc_id, documents.lang, st.n_tokens
             FROM st JOIN documents USING (doc_id)
             WHERE st.ent >= 3000000 AND st.ttr_pm >= 450),
    h AS (SELECT *, CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS hv
          FROM kept),
    ku AS (SELECT *,
                  CAST(floor(-ln((CAST(hv AS DOUBLE) + 1) / 281474976710656.0) * 1000000 + 0.5) AS BIGINT) AS e_unat
           FROM h),
    r AS (SELECT *, row_number() OVER (PARTITION BY lang
                      ORDER BY CAST(e_unat AS DOUBLE) / CAST(n_tokens AS DOUBLE), doc_id) AS rn
          FROM ku)
    SELECT doc_id, lang, n_tokens, CAST(rn AS INT) AS sample_rank,
           CASE WHEN hv % 1000 < 900 THEN 'train' ELSE 'val' END AS split
    FROM r WHERE rn <= 25 ORDER BY doc_id"""))

  val list: Seq[Q] = Seq(q63, q64, q113, q124, q137)
}
