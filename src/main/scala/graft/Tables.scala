package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet has carried TIMESTAMP(NANOS) in some generations
    // and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others; self-heal
    // sessions built without either conf (both are runtime-settable).
    // nanosAsLong: read nanos as long (events() converts to micros).
    // inferTimestampNTZ=false: read un-adjusted micros as TimestampType
    // (session TZ is UTC, so values match DuckDB's read byte-for-byte)
    // instead of TIMESTAMP_NTZ, which unix_micros/window/watermark
    // reject.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with its `ts` column normalized to a proper TimestampType
    * at microsecond precision regardless of the file's physical type —
    * long nanos (legacy generations, truncated exactly as DuckDB does)
    * or NTZ micros (belt-and-suspenders if a caller loaded before the
    * conf landed).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so SQL-text queries can run. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
