package graft.queriesExt

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Curation
import graft.queriesRelational.RelationalQueries.Q

/** Oracle corpus for the curation operators (PII redaction, URL
  * extraction/blocklisting, repetition metrics, decontamination,
  * mixing weights).
  *
  * The documents table is synthetic word soup with no PII or URLs, so
  * q81/q82 append DETERMINISTIC doc_id-derived PII/URLs to each text
  * before running the operator — the multimodal stand-in-payload
  * pattern (q56): the operator machinery (regex extraction, parse_url,
  * redaction order, blocklist matching) is fully exercised and the
  * oracle replays the same synthesis.
  */
object CurationQueries {

  /** hash48 in DuckDB (same formulation as DedupQueries). */
  private def h48(s: String): String =
    s"CAST(concat('0x', substr(md5($s), 1, 12)) AS BIGINT)"

  // -------------------------------------------------------------- q81 PII
  private def piiTextSpark = concat(col("text"),
    lit(" reach user"), col("doc_id").cast("string"),
    lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".example.com"),
    when(col("doc_id") % 3 === 0,
      concat(lit(" alt"), col("doc_id").cast("string"), lit("@ex.org"))).otherwise(lit("")),
    lit(" call "),
    lpad((col("doc_id") * 7 % 1000).cast("string"), 3, "0"), lit("-"),
    lpad((col("doc_id") * 13 % 1000).cast("string"), 3, "0"), lit("-"),
    lpad((col("doc_id") * 29 % 10000).cast("string"), 4, "0"),
    lit(" from "),
    (col("doc_id") * 3 % 256).cast("string"), lit("."),
    (col("doc_id") * 5 % 256).cast("string"), lit("."),
    (col("doc_id") * 11 % 256).cast("string"), lit("."),
    (col("doc_id") * 17 % 256).cast("string"))

  // NOTE: SparkEntry runs stripMargin over oracle SQL, so no line may
  // start with '|' — keep concatenation operators at line ends.
  private val piiTextSql =
    """text || ' reach user' || CAST(doc_id AS VARCHAR) ||
      '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ||
      CASE WHEN doc_id % 3 = 0
           THEN ' alt' || CAST(doc_id AS VARCHAR) || '@ex.org' ELSE '' END ||
      ' call ' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0') ||
      '-' || lpad(CAST(doc_id * 13 % 1000 AS VARCHAR), 3, '0') ||
      '-' || lpad(CAST(doc_id * 29 % 10000 AS VARCHAR), 4, '0') ||
      ' from ' || CAST(doc_id * 3 % 256 AS VARCHAR) ||
      '.' || CAST(doc_id * 5 % 256 AS VARCHAR) ||
      '.' || CAST(doc_id * 11 % 256 AS VARCHAR) ||
      '.' || CAST(doc_id * 17 % 256 AS VARCHAR)"""

  /** PII redaction: match counts on the original text + md5 of the
    * redacted text (email -> phone -> IPv4 application order). A
    * narrow codegen'd projection — composes with the scan, no shuffle.
    */
  private val q81 = Q("q81_pii_redaction", (s, dir) => {
    val withPii = Tables.load(s, dir, "documents")
      .select(col("doc_id"), piiTextSpark.as("_t"))
    val counts = Curation.piiCounts(col("_t")).map { case (n, c) => c.as(n) }
    withPii
      .select((col("doc_id") +: counts :+
        md5(Curation.redactPii(col("_t"))).as("redacted_md5") :+
        length(Curation.redactPii(col("_t"))).cast("long").as("redacted_len")): _*)
      .orderBy(col("doc_id"))
  }, Some(s"""
    WITH p AS (SELECT doc_id, $piiTextSql AS t FROM documents),
    r AS (
      SELECT doc_id, t,
             regexp_replace(regexp_replace(regexp_replace(t,
               '${Curation.EMAIL_RE}', '<EMAIL>', 'g'),
               '${Curation.PHONE_RE}', '<PHONE>', 'g'),
               '${Curation.IPV4_RE}', '<IP>', 'g') AS red
      FROM p)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '${Curation.EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '${Curation.PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '${Curation.IPV4_RE}')) AS BIGINT) AS n_ips,
           md5(red) AS redacted_md5,
           CAST(len(red) AS BIGINT) AS redacted_len
    FROM r ORDER BY doc_id"""))

  // -------------------------------------------------------------- q82 URLs
  /** URL extraction + component parse (parse_url host/path/query) +
    * blocklist flag; the oracle replays components with regexes.
    */
  private val q82 = Q("q82_url_extract", (s, dir) => {
    val withUrls = Tables.load(s, dir, "documents")
      .select(col("doc_id"), concat(col("text"),
        lit(" see https://site"), (col("doc_id") % 7).cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string"),
        lit("?ref=r"), (col("doc_id") % 5).cast("string"),
        lit(" and http://cdn"), (col("doc_id") % 3).cast("string"),
        lit(".bad-ads.net/x/"), col("doc_id").cast("string")).as("_t"))
    Curation.extractUrls(withUrls, "doc_id", col("_t"), Seq(".bad-ads.net"))
      .orderBy(col("doc_id"), col("url_idx"))
  }, Some("""
    WITH u AS (
      SELECT doc_id,
             text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR) ||
               '.example.com/p/' || CAST(doc_id AS VARCHAR) ||
               '?ref=r' || CAST(doc_id % 5 AS VARCHAR) ||
               ' and http://cdn' || CAST(doc_id % 3 AS VARCHAR) ||
               '.bad-ads.net/x/' || CAST(doc_id AS VARCHAR) AS t
      FROM documents),
    ls AS (SELECT doc_id,
             list_transform(regexp_extract_all(t, 'https?://[^\s]+'),
               u -> regexp_replace(u, '[.,;:!?''")\]]+$', '')) AS urls
           FROM u),
    ex AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(urls) + 1),
               i -> {'idx': i - 1, 'url': urls[i]})) AS s
      FROM ls)
    SELECT doc_id,
           CAST(s.idx AS INT) AS url_idx,
           s.url AS url,
           regexp_extract(s.url, 'https?://([^/]+)', 1) AS url_host,
           regexp_extract(s.url, 'https?://[^/]+(/[^?]*)', 1) AS url_path,
           regexp_extract(s.url, '[?&]ref=([^&]*)', 1) AS url_ref,
           CAST(regexp_extract(s.url, 'https?://([^/]+)', 1) LIKE '%.bad-ads.net' AS INT) AS blocked
    FROM ex ORDER BY doc_id, url_idx"""))

  // ------------------------------------------------- q83 repetition metrics
  /** Gopher-style repetition filter signals: duplicate/top n-gram
    * fractions (exact integer divisions — engine-independent) + flag.
    */
  private val q83 = Q("q83_repetition", (s, dir) => {
    Curation.repetitionMetrics(Tables.load(s, dir, "documents"), "doc_id", col("text"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g2 AS (
      SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS g
      FROM t),
    c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
    s2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2, count(*) AS d2, max(c) AS top2
           FROM c2 GROUP BY doc_id),
    g3 AS (
      SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
      FROM t),
    c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g),
    s3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3, count(*) AS d3 FROM c3 GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(n2, 0) AS n_2grams,
           floor(coalesce(1.0 - CAST(d2 AS DOUBLE) / n2, 0.0) * 1000000 + 0.5) / 1000000.0 AS dup_frac_2,
           floor(coalesce(CAST(top2 AS DOUBLE) / n2, 0.0) * 1000000 + 0.5) / 1000000.0 AS top_frac_2,
           floor(coalesce(1.0 - CAST(d3 AS DOUBLE) / n3, 0.0) * 1000000 + 0.5) / 1000000.0 AS dup_frac_3,
           CAST(coalesce(1.0 - CAST(d2 AS DOUBLE) / n2, 0.0) > 0.05
                OR coalesce(CAST(top2 AS DOUBLE) / n2, 0.0) > 0.10 AS INT) AS flagged
    FROM documents d LEFT JOIN s2 ON d.doc_id = s2.doc_id
                     LEFT JOIN s3 ON d.doc_id = s3.doc_id
    ORDER BY d.doc_id"""))

  // --------------------------------------------- q84 decontamination
  /** ONE oracle for both decontamination paths: q99's bloom prefilter
    * is exact by construction (no false negatives + exact confirm), so
    * it must hash-match the same SQL the pure exact path matches.
    */
  private val decontamOracleSql = s"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 6),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] ||
                 ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]))) AS g
      FROM t),
    h AS (SELECT doc_id, ${h48("g")} AS h FROM g),
    ev AS (SELECT DISTINCT h FROM h WHERE doc_id % 97 = 0),
    c AS (
      SELECT h.doc_id, count(*) AS n_grams,
             CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
      FROM h LEFT JOIN ev ON h.h = ev.h
      WHERE h.doc_id % 97 <> 0 GROUP BY h.doc_id)
    SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
           coalesce(n_matched, 0) AS n_matched,
           floor(coalesce(CAST(n_matched AS DOUBLE) / n_grams, 0.0) * 1000000 + 0.5) / 1000000.0 AS contam_frac,
           CAST(coalesce(n_matched, 0) > 0 AS INT) AS contaminated
    FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
    WHERE d.doc_id % 97 <> 0
    ORDER BY d.doc_id"""

  /** Benchmark decontamination: corpus docs (doc_id % 97 != 0) checked
    * for 8-gram overlap against the eval split (doc_id % 97 = 0); the
    * eval gram table broadcasts.
    */
  private val q84 = Q("q84_decontamination", (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    Curation.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", col("text"), n = 8)
      .orderBy(col("doc_id"))
  }, Some(decontamOracleSql))

  // ---------------------------------------- q99 bloom decontamination
  /** The 100 TB decontamination plan: bloom prefilter in the scan
    * stage, exact confirm on the ~1% survivors. Exact output — same
    * oracle SQL as q84, which is the point: a user can swap the plans
    * without re-validating results.
    */
  private val q99 = Q("q99_bloom_decontamination", (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    Curation.decontaminateBloom(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", col("text"), n = 8)
      .orderBy(col("doc_id"))
  }, Some(decontamOracleSql))

  // --------------------------------------------- q85 mixing weights
  /** sqrt-temperature source mixing weights. The normalizing sum runs
    * over integer-quantized weights, so it is addition-order-proof.
    */
  private val q85 = Q("q85_mixing_weights", (s, dir) => {
    Curation.mixingWeights(Tables.load(s, dir, "documents"),
        col("source"), size(split(col("text"), " ")))
      .orderBy(col("stratum"))
  }, Some("""
    WITH a AS (
      SELECT source AS stratum, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    b AS (SELECT *, CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share FROM a),
    c AS (SELECT *, CAST(floor(sqrt(share) * 1000000000 + 0.5) AS BIGINT) AS w FROM b),
    d AS (SELECT *, CAST(w AS DOUBLE) / sum(w) OVER () AS weight FROM c)
    SELECT stratum, n_docs, n_tokens,
           floor(share * 1000000 + 0.5) / 1000000.0 AS share,
           floor(weight * 1000000 + 0.5) / 1000000.0 AS weight,
           floor(weight / share * 1000000 + 0.5) / 1000000.0 AS upweight
    FROM d ORDER BY stratum"""))

  // --------------------------------------- q106 curation pipeline e2e
  /** The composed curation pipeline a user actually runs — quality
    * gate -> exact dedup (min-id keeper) -> decontamination -> split
    * assignment -> per-(split, lang) corpus stats — each stage the
    * already-oracle-checked operator, chained. The oracle replays the
    * whole chain as one CTE stack, so stage INTERACTIONS (e.g. dedup
    * keepers feeding the decontamination keep-set) are hash-checked,
    * not just stages in isolation.
    *
    * Scale: the stages compose without materialization — quality is a
    * scan filter, dedup is one hash shuffle of (md5, id), the keep
    * sets come back as semi joins on the id key, decontamination is
    * the broadcast-eval inverted index (q84), split is a narrow hash
    * expression, and the final rollup is a map-side-combined groupBy
    * over (split, lang).
    */
  private val q106 = Q("q106_curation_pipeline", (s, dir) => {
    import graft.operators.{CorpusOps, Dedup}
    val docs = Tables.load(s, dir, "documents")
    val evalSplit = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val quality = corpus.filter(size(split(col("text"), " ")) >= 30)
    val keepers = Dedup.exact(quality, "doc_id", col("text"))
      .select(col("keeper").as("doc_id"))
    val deduped = quality.join(keepers, Seq("doc_id"), "left_semi")
    val clean = Curation.decontaminate(deduped, evalSplit, "doc_id", col("text"), n = 8)
      .filter(col("contaminated") === 0).select("doc_id")
    val kept = deduped.join(clean, Seq("doc_id"), "left_semi")
    CorpusOps.assignSplit(kept, col("doc_id"),
        Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .orderBy(col("split"), col("lang"))
  }, Some(s"""
    WITH corpus AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
    q AS (SELECT * FROM corpus WHERE len(string_split(text, ' ')) >= 30),
    keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    dd AS (SELECT q.* FROM q JOIN keep ON q.doc_id = keep.doc_id),
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 6),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] ||
                 ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]))) AS g
      FROM t),
    h AS (SELECT doc_id, ${h48("g")} AS h FROM g),
    ev AS (SELECT DISTINCT h FROM h WHERE doc_id % 97 = 0),
    contam AS (SELECT DISTINCT h.doc_id FROM h JOIN ev ON h.h = ev.h WHERE h.doc_id % 97 <> 0),
    kept AS (SELECT dd.* FROM dd LEFT JOIN contam ON dd.doc_id = contam.doc_id
             WHERE contam.doc_id IS NULL),
    sp AS (SELECT *, CASE WHEN bucket < 900 THEN 'train'
                          WHEN bucket < 950 THEN 'val'
                          ELSE 'test' END AS split
           FROM (SELECT *, CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 1000 AS bucket
                 FROM kept))
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM sp GROUP BY split, lang ORDER BY split, lang"""))

  // ---------------------------------- q206 eval-side contamination
  /** Contamination severity per EVAL doc (round 13): the transpose of
    * q84 — for each eval doc (doc_id % 97 = 0), the fraction of its
    * distinct 8-grams present anywhere in the corpus split. The
    * oracle is q84's SQL with the roles of the two splits swapped.
    */
  private val q206 = Q("q206_eval_contamination", (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    Curation.evalContamination(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", col("text"), n = 8)
      .orderBy(col("doc_id"))
  }, Some(s"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 6),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] ||
                 ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]))) AS g
      FROM t),
    h AS (SELECT doc_id, ${h48("g")} AS h FROM g),
    corp AS (SELECT DISTINCT h FROM h WHERE doc_id % 97 <> 0),
    c AS (
      SELECT h.doc_id, count(*) AS n_grams,
             CAST(sum(CASE WHEN corp.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
      FROM h LEFT JOIN corp ON h.h = corp.h
      WHERE h.doc_id % 97 = 0 GROUP BY h.doc_id)
    SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
           coalesce(n_matched, 0) AS n_matched,
           floor(coalesce(CAST(n_matched AS DOUBLE) / n_grams, 0.0) * 1000000 + 0.5) / 1000000.0 AS contam_frac,
           CAST(coalesce(n_matched, 0) > 0 AS INT) AS contaminated
    FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
    WHERE d.doc_id % 97 = 0
    ORDER BY d.doc_id"""))

  val list: Seq[Q] = Seq(q81, q82, q83, q84, q85, q99, q106, q206)
}
