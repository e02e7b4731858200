package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(rows: Seq[(Long, Long, Long)], width: Long): Set[Long] =
    Skyline.skyline2D(rows.toDF("id", "x", "y"), col("x"), col("y"), width)
      .select("id").as[Long].collect().toSet

  private def brute(rows: Seq[(Long, Long, Long)]): Set[Long] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, sx, sy) =>
        sx <= x && sy <= y && (sx < x || sy < y)
      }
    }.map(_._1).toSet

  test("skyline2D matches the domination definition on a hand case") {
    // (1,9) (3,7) (5,5) frontier; (3,8) dominated by (3,7); (6,5) by (5,5)
    val rows = Seq((1L, 1L, 9L), (2L, 3L, 7L), (3L, 5L, 5L),
      (4L, 3L, 8L), (5L, 6L, 5L), (6L, 9L, 9L))
    assert(sky(rows, 2L) == Set(1L, 2L, 3L))
  }

  test("skyline2D: duplicates of a frontier point all survive; dominated duplicates all drop") {
    val rows = Seq((1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 6L), (4L, 2L, 5L))
    assert(sky(rows, 10L) == Set(1L, 2L))
  }

  test("skyline2D agrees with brute force across bucket widths (boundary-straddling cases)") {
    // deterministic pseudo-random cloud; widths 1, 7, 1000 exercise
    // many-buckets, straddling, and single-bucket regimes
    val rows = (1L to 200L).map { i =>
      (i, (i * 7919) % 97, (i * 6271) % 89)
    }
    val want = brute(rows)
    for (w <- Seq(1L, 7L, 1000L))
      assert(sky(rows, w) == want, s"width $w disagrees with brute force")
  }

  test("skyline2D: the only single-partition work is the tiny bucket summary") {
    val rows = (1L to 100L).map(i => (i, (i * 13) % 50, (i * 17) % 50))
    val plan = Skyline.skyline2D(rows.toDF("id", "x", "y"), col("x"), col("y"), 5L)
      .queryExecution.executedPlan.toString
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singles <= 1, s"expected at most one single-partition exchange (bucket summary):\n$plan")
    // the per-row windows must be partitioned by bucket, not global
    assert(plan.contains("windowspecdefinition(_bkt"),
      s"row-level windows must partition by bucket:\n${plan.take(3000)}")
  }
}
