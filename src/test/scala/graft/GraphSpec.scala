package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("2-cycle is a fixed point: each node holds exactly half the mass") {
    // r = 150e6//2 + 85*5e8//100 = 75e6 + 425e6 = 5e8 every iteration
    val r = ranks(Seq((1L, 2L), (2L, 1L)), 3)
    assert(r == Map(1L -> 500000000L, 2L -> 500000000L))
  }

  test("dangling node leaks mass; source decays to pure teleport") {
    // 1 -> 2, node 2 dangling. After iter 1: r1 = teleport = 75e6,
    // r2 = 75e6 + 85% * 5e8 = 5e8. From iter 2 on:
    // r2 = 75e6 + 85*75e6//100 = 138_750_000 (hand-computed).
    val r = ranks(Seq((1L, 2L)), 3)
    assert(r == Map(1L -> 75000000L, 2L -> 138750000L))
  }

  test("hub with all in-links outranks spokes; result is deterministic") {
    // spokes 1..5 each link to hub 0; hub links back to spoke 1
    val edges = (1L to 5L).map(i => (i, 0L)) :+ (0L, 1L)
    val r = ranks(edges, 3)
    assert(r(0L) > r(1L) && r(1L) > r(2L), s"authority order broken: $r")
    assert((2L to 5L).map(r).toSet.size == 1, s"equal spokes must tie: $r")
    // bit-identical across runs (integer arithmetic, no RNG)
    assert(ranks(edges, 3) == r)
  }

  test("parallel/self edges are dropped before degree counting") {
    val r1 = ranks(Seq((1L, 2L), (1L, 2L), (1L, 1L), (2L, 1L)), 2)
    val r2 = ranks(Seq((1L, 2L), (2L, 1L)), 2)
    assert(r1 == r2)
  }
}
