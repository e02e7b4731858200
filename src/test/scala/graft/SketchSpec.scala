package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregator

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("misra-gries: exact counts when capacity >= distinct keys, across partitions") {
    val data = (1 to 400).map(i => s"k${i % 7}") ++ Seq.fill(50)("hot")
    val df = spark.createDataset(data).repartition(8).toDF("t")
    val mg = udaf(new MisraGriesAggregator(16))
    val got = df.agg(mg(col("t")).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    val want = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
  }

  test("misra-gries: under eviction, heavy items survive and counts are within N/(k+1)") {
    // skewed stream: "heavy" is 40% of N, far above N/(k+1) with k=4
    val n = 1000
    val data = Seq.fill(400)("heavy") ++ (1 to 600).map(i => s"tail${i % 97}")
    val df = spark.createDataset(data).repartition(4).toDF("t")
    val cap = 4
    val mg = udaf(new MisraGriesAggregator(cap))
    val got = df.agg(mg(col("t")).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    val bound = n / (cap + 1)
    assert(got.size <= cap, s"summary exceeded capacity: $got")
    assert(got.contains("heavy"), s"heavy hitter evicted: $got")
    val true400 = 400L
    val est = got("heavy")
    assert(est <= true400 && est >= true400 - bound,
      s"estimate $est outside [${true400 - bound}, $true400]")
    // every reported count underestimates by at most N/(k+1)
    val trueCounts = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    got.foreach { case (k, c) =>
      assert(c <= trueCounts(k) && c >= trueCounts(k) - bound,
        s"$k: est $c vs true ${trueCounts(k)}, bound $bound")
    }
  }

  test("misra-gries merge: boundary ties drop together (order-independent)") {
    val agg = new MisraGriesAggregator(2)
    val x = Map("a" -> 5L, "b" -> 3L)
    val y = Map("c" -> 3L, "d" -> 1L)
    // summed = a5 b3 c3 d1; 3rd largest = 3 -> subtract 3 everywhere:
    // a2 survive, b and c hit 0 and drop TOGETHER, d negative drops
    assert(agg.merge(x, y) == Map("a" -> 2L))
    assert(agg.merge(y, x) == Map("a" -> 2L))
  }

  test("misra-gries reduce: decrement-all fires only with a full summary") {
    val agg = new MisraGriesAggregator(2)
    val b1 = agg.reduce(agg.reduce(agg.zero, "a"), "a") // a:2
    val b2 = agg.reduce(b1, "b")                        // a:2 b:1 (slot free)
    val b3 = agg.reduce(b2, "c")                        // full -> decrement: a:1
    assert(b3 == Map("a" -> 1L))
  }
}
