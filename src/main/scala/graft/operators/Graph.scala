package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for web-corpus curation: a domain/host-level
  * authority score (PageRank) is a standard quality prior for weighting
  * or filtering crawled training data (domains nobody links to are
  * disproportionately spam/SEO farms).
  *
  * Determinism contract: ranks live on an INTEGER micro-rank grid
  * (1e-9 units of probability mass) and every update is integer
  * arithmetic — floor division for the per-edge contribution split and
  * the damping factor — so a fixed iteration count yields bit-identical
  * longs on any engine, partitioning, or aggregation order. No doubles
  * exist anywhere in the computation, which is what lets a DuckDB
  * oracle replay it exactly (q102).
  */
object Graph {

  /** Micro-rank scale: 1 full unit of probability mass = 1e9. */
  val RANK_SCALE = 1000000000L

  /** Exact long floor-division for NON-NEGATIVE operands: (a - a%b)/b
    * keeps the divide exactly representable (the quotient is an
    * integer < 2^53), where a plain `/` would round a near-integer
    * quotient up through floor. Mirrors DuckDB's `//`.
    */
  private def ldiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("long")

  /** Fixed-iteration PageRank over an edge list (src -> dst), damping
    * 85/100, uniform teleport. Returns (node, rank_u) with rank_u in
    * micro-rank units.
    *
    * Semantics notes (all mirrored by the oracle):
    *  - parallel edges count once — callers pass a distinct edge list
    *    (this function distincts defensively);
    *  - dangling nodes (no out-edges) leak their mass — the standard
    *    simplification; total mass therefore decays slightly per
    *    iteration, which is irrelevant for the RANKING use;
    *  - integer floor-division drops sub-micro remainders (same).
    *
    * Scale shape: per iteration, ONE shuffle of (node, contribution)
    * longs — the Pregel pattern the connected-components operator
    * already uses. The node count enters as a broadcast one-row
    * aggregate (no driver count); `localCheckpoint` truncates the
    * iterative lineage each round. Edges re-read per iteration —
    * persist the (small) edge list if it is not already a table.
    * Iterations are FIXED — no convergence probe, no collect; the
    * only driver-triggered jobs are the eager per-iteration
    * `localCheckpoint` materializations that truncate the lineage.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .filter(col("_src") =!= col("_dst")).distinct()
    val nodes = e.select(col("_src").as("node"))
      .union(e.select(col("_dst").as("node"))).distinct()
    val nRow = nodes.agg(count(lit(1)).as("_n"))
    val outdeg = e.groupBy(col("_src")).agg(count(lit(1)).as("_outdeg"))
    val teleport = ldiv(lit(RANK_SCALE * 15L / 100L), col("_n"))
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), ldiv(lit(RANK_SCALE), col("_n")).as("rank_u"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val contribs = e
        .join(ranks, e("_src") === ranks("node"))
        .join(outdeg, "_src")
        .select(col("_dst").as("node"),
          ldiv(col("rank_u"), col("_outdeg")).as("_c"))
      val inSum = contribs.groupBy(col("node")).agg(sum(col("_c")).as("_s"))
      ranks = nodes.crossJoin(broadcast(nRow))
        .join(inSum, Seq("node"), "left")
        .select(col("node"),
          (teleport + ldiv(lit(85L) * coalesce(col("_s"), lit(0L)), lit(100L))).as("rank_u"))
        .localCheckpoint()
    }
    ranks
  }
}
