package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet+json-lines (B1-B4): the
  * same frame must survive a write/read roundtrip byte-identically in
  * every bundled format — CSV (quoting/escaping on free text), ORC
  * (the other columnar), JSON-lines, and text. At 100 TB the engine
  * ingests whatever the upstream producers emit; a format that
  * silently mangles a corner (CSV quotes, nulls, unicode) corrupts
  * the corpus at the first hop.
  */
class SourceFormatsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (1L, "plain words", "en"),
    (2L, "comma, quote \" and 'single'", "de"),
    (3L, "newline\\n-escape and\ttab", "fr"),
    (4L, null.asInstanceOf[String], "zh"),
    (5L, "unicode é世界 ok", "es"))
    .toDF("id", "text", "lang")

  private def roundtrip(fmt: String, opts: Map[String, String]): Unit = {
    val base = java.nio.file.Files.createTempDirectory(s"graft-fmt-$fmt").toString
    fixture.write.options(opts).format(fmt).save(s"$base/out")
    val back = spark.read.options(opts).schema(fixture.schema).format(fmt)
      .load(s"$base/out")
    val a = fixture.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"$fmt roundtrip mangled rows:\n$a\nvs\n$b")
  }

  test("csv roundtrip preserves quotes, commas, tabs, nulls and unicode") {
    roundtrip("csv", Map("header" -> "true", "escape" -> "\""))
  }

  test("orc roundtrip is byte-identical") {
    roundtrip("orc", Map.empty)
  }

  test("json-lines roundtrip is byte-identical") {
    roundtrip("json", Map.empty)
  }

  test("documents table survives a csv re-materialization (free-text at fixture scale)") {
    val base = java.nio.file.Files.createTempDirectory("graft-fmt-docs").toString
    val docs = Tables.load(spark, sfDir, "documents")
    docs.write.option("header", "true").option("escape", "\"").csv(s"$base/csv")
    val back = spark.read.option("header", "true").option("escape", "\"")
      .schema(docs.schema).csv(s"$base/csv")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
      "csv re-materialization changed the corpus")
  }
}
