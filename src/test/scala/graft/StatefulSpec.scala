package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.Keyed

/** B36 arbitrary state + B45 UDF surface. */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("quota governor keeps per-key running state across micro-batches") {
    val base = Files.createTempDirectory("graft-state").toString
    // two files -> maxFilesPerTrigger=1 forces two micro-batches
    Seq(Keyed("a", 40L), Keyed("a", 40L), Keyed("b", 10L)).toDS()
      .coalesce(1).write.json(s"$base/in/f1")
    Seq(Keyed("a", 40L), Keyed("b", 10L)).toDS()
      .coalesce(1).write.json(s"$base/in/f2")
    val stream = spark.readStream
      .schema("key STRING, size LONG")
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .json(s"$base/in")
      .as[Keyed]
    val q = StatefulOps.quotaGovernor(stream, quota = 100L)
      .writeStream.outputMode("update").format("memory").queryName("quota_out")
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("quota_out")
      .as[StatefulOps.QuotaResult].collect().groupBy(_.key)
    // key a: batch1 accepts 40+40=80; batch2's 40 would exceed 100 -> dropped
    val aFinal = rows("a").maxBy(_.used)
    assert(aFinal.used == 80L && rows("a").map(_.dropped).sum == 1L)
    // key b: 10+10=20, nothing dropped
    val bFinal = rows("b").maxBy(_.used)
    assert(bFinal.used == 20L && rows("b").map(_.dropped).sum == 0L)
  }

  test("scala UDF registration surface (B45)") {
    spark.udf.register("graft_token_count", (s: String) => s.split(" ").length)
    val n = spark.sql("SELECT graft_token_count('a b c') AS n").head().getInt(0)
    assert(n == 3)
  }
}
