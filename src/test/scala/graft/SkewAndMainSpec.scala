package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

class SkewSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey")
      .agg(count(lit(1)), sum(floor(col("o_totalprice"))).cast("long")).collect().head
    val salted = SkewOps.saltedJoin(li, o, "l_orderkey", col("l_linenumber"), buckets = 8)
      .agg(count(lit(1)), sum(floor(col("o_totalprice"))).cast("long")).collect().head
    assert(plain == salted)
  }

  test("salt spreads a hot key across buckets") {
    val hot = (1 to 1000).map(i => (42L, i)).toSeq
    import spark.implicits._
    val df = hot.toDF("key", "row_id")
    val buckets = df.select(SkewOps.salt(col("row_id"), 8).as("s"))
      .groupBy("s").count().collect()
    assert(buckets.length == 8)
    assert(buckets.map(_.getLong(1)).max < 400) // no bucket holds most rows
  }
}

/** Drives graft.Main --once end-to-end: the runnable pipeline. */
class MainSpec extends SparkSpec {
  import Fixtures._

  test("Main --once delivers a record through the full pipeline") {
    val base = java.nio.file.Files.createTempDirectory("graft-main").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
    val rec = record("r1", envelopeJson("DATA_MESSAGE", Seq("Hello Main!")))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/in/f.json"),
      s"""{"recordId":"${rec._1}","data":"${rec._2}"}""".getBytes)
    Main.stopOnExit = false
    Main.main(Array(s"$base/in", s"$base/out", s"$base/ck", "--once"))
    val primary = spark.read.text(s"$base/out/primary").collect().map(_.getString(0))
    assert(primary.toSeq == Seq("Hell Yeah Main!"))
  }
}
