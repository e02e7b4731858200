package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (round 19): attribute q218's time between the gram
  * explode + count shuffle and the per-(doc, n) extremum fold — the
  * round-18 verdict flagged the fold's SortAggregate (min over a
  * struct carrying the gram STRING is not hash-aggregable) as a
  * target; this measures whether the Sort actually costs anything
  * before any restructuring. Also times the ObjectHashAggregate
  * alternative (collect_list + interpreted array fold) to have the
  * counter-proposal's number on record.
  */
object RepAggProbe extends App {
  val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val docs = graft.Tables.load(spark, sf, "documents")

  val allNs = Seq(2, 3, 4, 5)
  def rows0 = docs
    .filter(col("doc_id").isNotNull && col("text").isNotNull)
    .select(col("doc_id"), length(col("text")).as("n_chars"),
      explode(array(allNs.map(n => struct(lit(n).as("n"),
        graft.functions.shingles.wordShingles(col("text"), n).as("grams"))): _*))
        .as("_g"))
    .select(col("doc_id"), col("n_chars"), col("_g.n").as("n"),
      explode(col("_g.grams")).as("gram"))
  def counts = rows0.repartition(col("doc_id"))
    .groupBy(col("doc_id"), col("n_chars"), col("n"), col("gram"))
    .agg(count(lit(1)).as("cnt"))

  def pernSort = counts.groupBy(col("doc_id"), col("n_chars"), col("n"))
    .agg(sum(col("cnt")).as("total"),
      sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("dup_occ"),
      min(struct((-col("cnt")).as("nc"), col("gram").as("g"))).as("top"))

  def pernObj = {
    val init = struct(lit(Long.MaxValue).as("nc"), lit("").as("g"))
    counts.groupBy(col("doc_id"), col("n_chars"), col("n"))
      .agg(sum(col("cnt")).as("total"),
        sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("dup_occ"),
        aggregate(collect_list(struct((-col("cnt")).as("nc"), col("gram").as("g"))),
          init, (acc, x) => when(x < acc, x).otherwise(acc)).as("top"))
  }

  def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
    val ts = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE $label min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
  }

  time("scan-only")(docs.select(col("doc_id"), col("text")))
  time("grams-explode")(rows0)
  time("counts")(counts)
  time("pern-sortagg")(pernSort)
  time("pern-objhash")(pernObj)
  // sanity: identical extrema
  val a = pernSort.select(col("doc_id"), col("n"), col("top.nc"), col("top.g")).collect()
    .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getString(3))).toMap
  val b = pernObj.select(col("doc_id"), col("n"), col("top.nc"), col("top.g")).collect()
    .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getString(3))).toMap
  println(s"PROBE equal=${a == b} groups=${a.size}")
  spark.stop()
}
