package graft.queriesExt

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph
import graft.queriesRelational.RelationalQueries.Q

/** Oracle corpus for the link-graph curation operators. The graph is
  * synthesized DETERMINISTICALLY from doc_id arithmetic (the q81/q82
  * stand-in pattern): a 50-node domain graph with two out-links per
  * document, distinct-ed — the oracle replays the same synthesis and
  * unrolls the fixed PageRank iterations as CTEs. Every value is an
  * integer (micro-rank longs), so the comparison is exact, not
  * quantized.
  */
object GraphQueries {

  /** One PageRank iteration as a pair of CTEs: per-edge floor-div
    * contribution sums, then teleport + damped in-sum. DuckDB's `//`
    * is the same nonnegative floor division as the operator's ldiv;
    * sum() widens to HUGEINT, so the damped term casts back to BIGINT.
    */
  private def prIterCtes(k: Int): String =
    (1 to k).map { i =>
      val prev = s"r${i - 1}"
      s""",
    c$i AS (SELECT e.dst AS node, sum($prev.rank_u // deg.outdeg) AS s
            FROM e JOIN $prev ON e.src = $prev.node JOIN deg ON e.src = deg.src
            GROUP BY e.dst),
    r$i AS (SELECT nodes.node,
                   CAST((150000000 // nn) + (85 * coalesce(c$i.s, 0)) // 100 AS BIGINT) AS rank_u
            FROM nodes CROSS JOIN n LEFT JOIN c$i ON nodes.node = c$i.node)"""
    }.mkString

  /** Domain-authority PageRank, 3 fixed iterations, all-integer. */
  private val q102 = Q("q102_pagerank", (s, dir) => {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
    val edges = d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 13 + 7) % 50).as("dst"))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 29 + 11) % 50).as("dst")))
    Graph.pageRank(edges, "src", "dst", iters = 3)
      .orderBy(col("node"))
  }, Some(s"""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id % 50 AS src, (doc_id * 13 + 7) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 29 + 11) % 50 AS dst FROM d),
    e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
    nodes AS (SELECT DISTINCT node FROM
      (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
    n AS (SELECT count(*) AS nn FROM nodes),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT node, CAST(1000000000 // nn AS BIGINT) AS rank_u FROM nodes CROSS JOIN n)${prIterCtes(3)}
    SELECT node, rank_u FROM r3 ORDER BY node"""))

  /** Per-node triangle counts on the same synthesized 50-node domain
    * graph as q102. The operator runs the degree-ordered-orientation
    * plan; the oracle enumerates triangles naively as a < b < c over
    * the canonical edge list — the triangle SET is
    * orientation-independent, so a plan bug (double-counted or missed
    * wedges) surfaces as a count mismatch.
    */
  private val q118 = Q("q118_triangles", (s, dir) => {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
    val edges = d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 3 + 1) % 50).as("dst"))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 7 + 2) % 50).as("dst")))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 11 + 5) % 50).as("dst")))
    Graph.triangles(edges, "src", "dst")
      .orderBy(col("node"))
  }, Some("""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id % 50 AS src, (doc_id * 3 + 1) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 7 + 2) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 11 + 5) % 50 AS dst FROM d),
    e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM e0 WHERE src <> dst),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    tn AS (
      SELECT unnest([x, y, z]) AS node FROM tri)
    SELECT node, count(*) AS n_triangles
    FROM tn GROUP BY node ORDER BY node"""))

  /** k-core peeling (k=6, 2 fixed peels) on the q118 graph — the
    * peel CASCADE is the point: iteration 1 drops the graph from 141
    * to 100 edges, which pushes more nodes under degree 6, and
    * iteration 2 collapses it to 12 (probed independently in DuckDB).
    * The oracle unrolls both peels as CTEs, exactly like q102's
    * PageRank iterations; output is each survivor's induced degree.
    */
  private val q127 = Q("q127_kcore", (s, dir) => {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
    val edges = d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 3 + 1) % 50).as("dst"))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 7 + 2) % 50).as("dst")))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 11 + 5) % 50).as("dst")))
    Graph.kCore(edges, "src", "dst", k = 6, iters = 2)
      .orderBy(col("node"))
  }, Some("""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id % 50 AS src, (doc_id * 3 + 1) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 7 + 2) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 11 + 5) % 50 AS dst FROM d),
    it0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM e0 WHERE src <> dst),
    d1 AS (SELECT node, count(*) AS dg FROM
             (SELECT a AS node FROM it0 UNION ALL SELECT b FROM it0)
           GROUP BY node),
    keep1 AS (SELECT node FROM d1 WHERE dg >= 6),
    it1 AS (SELECT a, b FROM it0
            WHERE a IN (SELECT node FROM keep1) AND b IN (SELECT node FROM keep1)),
    d2 AS (SELECT node, count(*) AS dg FROM
             (SELECT a AS node FROM it1 UNION ALL SELECT b FROM it1)
           GROUP BY node),
    keep2 AS (SELECT node FROM d2 WHERE dg >= 6),
    it2 AS (SELECT a, b FROM it1
            WHERE a IN (SELECT node FROM keep2) AND b IN (SELECT node FROM keep2))
    SELECT node, count(*) AS deg FROM
      (SELECT a AS node FROM it2 UNION ALL SELECT b FROM it2)
    GROUP BY node ORDER BY node"""))

  /** One synchronous LPA round as a CTE pair: neighbor-label counts,
    * then per-node argmax with (count DESC, label ASC) tie order —
    * exactly the operator's window.
    */
  private def lpaIterCtes(k: Int): String =
    (1 to k).map { i =>
      val prev = s"l${i - 1}"
      s""",
    nb$i AS (SELECT u.node, $prev.label, count(*) AS c
             FROM u JOIN $prev ON $prev.node = u.nbr
             GROUP BY u.node, $prev.label),
    l$i AS (SELECT node, label FROM (
              SELECT node, label,
                     row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
              FROM nb$i) WHERE rn = 1)"""
    }.mkString

  /** Community detection by synchronous min-tie label propagation on
    * the triangle-bearing 50-node domain graph (q118's synthesis), 4
    * fixed rounds unrolled as CTEs. Every label is an integer node id,
    * so the comparison is exact.
    */
  /** Spark-side synthesis of the triangle-bearing domain graph
    * (q118's families) + 4 LPA rounds; shared by q146/q147.
    */
  private def lpaCommunities(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
    val edges = d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 3 + 1) % 50).as("dst"))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 7 + 2) % 50).as("dst")))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 11 + 5) % 50).as("dst")))
    Graph.labelPropagation(edges, "src", "dst", iters = 4)
  }

  /** The q146/q147 shared WITH body: edge synthesis, undirected
    * adjacency, and 4 unrolled LPA rounds ending in l4(node, label).
    */
  private def lpaGraphCtes: String = s"""d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id % 50 AS src, (doc_id * 3 + 1) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 7 + 2) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 11 + 5) % 50 AS dst FROM d),
    e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM e0 WHERE src <> dst),
    u AS (SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b AS node, a AS nbr FROM e),
    l0 AS (SELECT DISTINCT node, node AS label FROM u)${lpaIterCtes(4)}"""

  private val q146 = Q("q146_label_propagation", (s, dir) => {
    lpaCommunities(s, dir).orderBy(col("node"))
  }, Some(s"""
    WITH $lpaGraphCtes
    SELECT node, label FROM l4 ORDER BY node"""))

  /** Community-weighted corpus selection — the curation shape the
    * communities exist FOR: map each document to its domain node,
    * attach the LPA community, and keep each community's top-p
    * (70%) mass by document length (CorpusOps.topP). Composes the
    * graph family with the sampling family end to end; the oracle
    * stacks the LPA CTEs under q125's top-p window arithmetic.
    */
  private val q147 = Q("q147_community_topp", (s, dir) => {
    import graft.operators.CorpusOps
    val comm = lpaCommunities(s, dir)
      .select(col("node").as("domain"), col("label").as("community"))
    val withComm = Tables.load(s, dir, "documents")
      .withColumn("domain", col("doc_id") % 50)
      .join(broadcast(comm), "domain")
    CorpusOps.topP(withComm, col("community"), col("doc_id"), col("n_chars"),
        pPermille = 700)
      .select(col("doc_id"), col("community"), col("n_chars"))
      .orderBy(col("doc_id"))
  }, Some(s"""
    WITH $lpaGraphCtes,
    dc AS (SELECT doc.doc_id, l4.label AS community, CAST(doc.n_chars AS BIGINT) AS w
           FROM documents doc JOIN l4 ON l4.node = doc.doc_id % 50),
    c AS (SELECT doc_id, community, w,
                 CAST(coalesce(sum(w) OVER (PARTITION BY community ORDER BY w DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb,
                 CAST(sum(w) OVER (PARTITION BY community) AS BIGINT) AS total
          FROM dc)
    SELECT doc_id, community, w AS n_chars
    FROM c WHERE cumb * 1000 < 700 * total ORDER BY doc_id"""))

  /** One personalized-PageRank iteration as a CTE pair: the q102
    * update with the teleport CASE'd onto the seed set.
    */
  private def pprIterCtes(k: Int, seedsSql: String, teleportU: Long): String =
    (1 to k).map { i =>
      val prev = s"r${i - 1}"
      s""",
    c$i AS (SELECT e.dst AS node, sum($prev.rank_u // deg.outdeg) AS s
            FROM e JOIN $prev ON e.src = $prev.node JOIN deg ON e.src = deg.src
            GROUP BY e.dst),
    r$i AS (SELECT nodes.node,
                   CAST(CASE WHEN nodes.node IN ($seedsSql) THEN $teleportU ELSE 0 END
                        + (85 * coalesce(c$i.s, 0)) // 100 AS BIGINT) AS rank_u
            FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node)"""
    }.mkString

  /** Related-domain expansion: personalized PageRank from seed domains
    * {3, 17} on the q102 link graph, 3 fixed all-integer iterations.
    */
  private val q149 = Q("q149_personalized_pagerank", (s, dir) => {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
    val edges = d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 13 + 7) % 50).as("dst"))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 29 + 11) % 50).as("dst")))
    Graph.personalizedPageRank(edges, "src", "dst", seeds = Seq(3L, 17L), iters = 3)
      .orderBy(col("node"))
  }, Some(s"""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id % 50 AS src, (doc_id * 13 + 7) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 29 + 11) % 50 AS dst FROM d),
    e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
    nodes AS (SELECT DISTINCT node FROM
      (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT node,
                  CAST(CASE WHEN node IN (3, 17) THEN ${Graph.RANK_SCALE / 2} ELSE 0 END AS BIGINT) AS rank_u
           FROM nodes)${pprIterCtes(3, "3, 17", Graph.RANK_SCALE * 15L / 100L / 2)}
    SELECT node, rank_u FROM r3 ORDER BY node"""))

  /** Link prediction on the q118 triangle-bearing graph: every
    * non-adjacent domain pair with shared neighbors, scored by
    * common-neighbor count and Adamic-Adar (inverse-log degree
    * weights on the integer micro-nat grid). The oracle restates the
    * wedge enumeration naively and excludes adjacent pairs with an
    * anti-join — a missed or double-counted wedge, a wrong degree, or
    * a leaked adjacent pair all surface as hash mismatches.
    */
  private val q174 = Q("q174_link_predict", (s, dir) => {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
    val edges = d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 3 + 1) % 50).as("dst"))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 7 + 2) % 50).as("dst")))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 11 + 5) % 50).as("dst")))
    Graph.linkPredict(edges, "src", "dst")
      .orderBy(col("node_a"), col("node_b"))
  }, Some("""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id % 50 AS src, (doc_id * 3 + 1) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 7 + 2) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 11 + 5) % 50 AS dst FROM d),
    e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM e0 WHERE src <> dst),
    u AS (SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT node, count(*) AS dg FROM u GROUP BY node),
    c AS (SELECT node,
                 1000000000000 // CAST(floor(ln(dg) * 1000000 + 0.5) AS BIGINT) AS aa
          FROM deg),
    wed AS (SELECT u1.node AS z, u1.nbr AS x, u2.nbr AS y
            FROM u u1 JOIN u u2 ON u1.node = u2.node AND u1.nbr < u2.nbr),
    sc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cn,
                  CAST(sum(c.aa) AS BIGINT) AS aam
           FROM wed JOIN c ON c.node = wed.z GROUP BY x, y)
    SELECT sc.x AS node_a, sc.y AS node_b, sc.cn AS common_neighbors,
           sc.aam AS aa_micro
    FROM sc LEFT JOIN e ON e.a = sc.x AND e.b = sc.y
    WHERE e.a IS NULL
    ORDER BY node_a, node_b"""))

  /** The CAPPED plan q174 proves exact, proved under its cap: same
    * graph, `maxCenterDegree = 5` — the scale lever that skips hub
    * centers (38 of this graph's 50 nodes have degree 6, so the cap
    * genuinely prunes most wedge fan-out, not a vacuous bound). The
    * oracle mirrors the cap in the contrib CTE (`dg <= 5`), so the
    * hash match proves the capped plan computes exactly the capped
    * DEFINITION — wedges through skipped hubs are absent, everything
    * else is untouched. GraphSpec asserts the hub-absence invariant
    * on a hand graph.
    */
  private val q187 = Q("q187_link_predict_capped", (s, dir) => {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
    val edges = d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 3 + 1) % 50).as("dst"))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 7 + 2) % 50).as("dst")))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 11 + 5) % 50).as("dst")))
    Graph.linkPredict(edges, "src", "dst", maxCenterDegree = 5)
      .orderBy(col("node_a"), col("node_b"))
  }, Some("""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id % 50 AS src, (doc_id * 3 + 1) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 7 + 2) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 11 + 5) % 50 AS dst FROM d),
    e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM e0 WHERE src <> dst),
    u AS (SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT node, count(*) AS dg FROM u GROUP BY node),
    c AS (SELECT node,
                 1000000000000 // CAST(floor(ln(dg) * 1000000 + 0.5) AS BIGINT) AS aa
          FROM deg WHERE dg <= 5),
    wed AS (SELECT u1.node AS z, u1.nbr AS x, u2.nbr AS y
            FROM u u1 JOIN u u2 ON u1.node = u2.node AND u1.nbr < u2.nbr),
    sc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cn,
                  CAST(sum(c.aa) AS BIGINT) AS aam
           FROM wed JOIN c ON c.node = wed.z GROUP BY x, y)
    SELECT sc.x AS node_a, sc.y AS node_b, sc.cn AS common_neighbors,
           sc.aam AS aa_micro
    FROM sc LEFT JOIN e ON e.a = sc.x AND e.b = sc.y
    WHERE e.a IS NULL
    ORDER BY node_a, node_b"""))

  /** Neighborhood Jaccard on the q174 graph: structural similarity
    * |N(a)∩N(b)| / |N(a)∪N(b)| for every pair with a shared
    * neighbor, the graph-side near-dup signal. The oracle restates
    * wedge counting + degree arithmetic + the exact integer micro
    * quotient; a missed wedge, wrong degree, or off-by-one in the
    * union (e.g. forgetting to subtract the intersection) all
    * surface as hash mismatches.
    */
  private val q189 = Q("q189_neighborhood_jaccard", (s, dir) => {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
    val edges = d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 3 + 1) % 50).as("dst"))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 7 + 2) % 50).as("dst")))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 11 + 5) % 50).as("dst")))
    Graph.neighborhoodJaccard(edges, "src", "dst")
      .orderBy(col("node_a"), col("node_b"))
  }, Some("""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id % 50 AS src, (doc_id * 3 + 1) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 7 + 2) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 11 + 5) % 50 AS dst FROM d),
    e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM e0 WHERE src <> dst),
    u AS (SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT node, count(*) AS dg FROM u GROUP BY node),
    cen AS (SELECT node FROM deg WHERE dg >= 2),
    wed AS (SELECT u1.node AS z, u1.nbr AS x, u2.nbr AS y
            FROM u u1 JOIN u u2 ON u1.node = u2.node AND u1.nbr < u2.nbr),
    cm AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cn
           FROM wed JOIN cen ON cen.node = wed.z GROUP BY x, y)
    SELECT cm.x AS node_a, cm.y AS node_b, cm.cn AS common_neighbors,
           da.dg + db.dg - cm.cn AS union_size,
           (cm.cn * 1000000) // (da.dg + db.dg - cm.cn) AS jac_micro
    FROM cm
    JOIN deg da ON da.node = cm.x
    JOIN deg db ON db.node = cm.y
    ORDER BY node_a, node_b"""))

  /** One BFS relaxation round as a CTE: keep every settled distance,
    * add each frontier node's neighbors at +1, take the min.
    */
  private def bfsIterCtes(k: Int): String =
    (1 to k).map { i =>
      val prev = s"b${i - 1}"
      s""",
    b$i AS (SELECT node, CAST(min(h) AS BIGINT) AS h FROM (
              SELECT node, h FROM $prev
              UNION ALL
              SELECT u.nbr AS node, $prev.h + 1 AS h
              FROM u JOIN $prev ON u.node = $prev.node)
            GROUP BY node)"""
    }.mkString

  /** Multi-source BFS from seed domains {3, 17} on the q118 graph, 3
    * fixed relaxation rounds unrolled as CTEs — every reached node's
    * exact minimum hop count from the seed set.
    */
  private val q175 = Q("q175_bfs_hops", (s, dir) => {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
    val edges = d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 3 + 1) % 50).as("dst"))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 7 + 2) % 50).as("dst")))
      .union(d.select((col("doc_id") % 50).as("src"),
        ((col("doc_id") * 11 + 5) % 50).as("dst")))
    Graph.bfsHops(edges, "src", "dst", seeds = Seq(3L, 17L), rounds = 3)
      .orderBy(col("node"))
  }, Some(s"""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id % 50 AS src, (doc_id * 3 + 1) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 7 + 2) % 50 AS dst FROM d
      UNION ALL
      SELECT doc_id % 50 AS src, (doc_id * 11 + 5) % 50 AS dst FROM d),
    e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM e0 WHERE src <> dst),
    u AS (SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
    b0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS h FROM u
           WHERE node IN (3, 17))${bfsIterCtes(3)}
    SELECT node, h AS hops FROM b3 ORDER BY node"""))

  val list: Seq[Q] = Seq(q102, q118, q127, q146, q147, q149, q174, q175,
    q187, q189)
}
