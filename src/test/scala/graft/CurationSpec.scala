package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Curation operators: PII redaction, URL extraction, repetition
  * metrics, decontamination, mixing weights — semantics on crafted
  * inputs plus the plan properties that matter at scale (redaction is
  * narrow, the eval gram table broadcasts).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii masks emails, phones and IPs; counts agree with matches") {
    val df = Seq(
      (1L, "mail a.b+c@x-corp.co.uk and bob@ex.org call 555-123-4567 from 10.0.0.1"),
      (2L, "no pii here"),
      (3L, "edge 1.2.3.4 999-000-1111 end"))
      .toDF("id", "t")
    val counts = Curation.piiCounts(col("t")).map { case (n, c) => c.as(n) }
    val out = df.select((col("id") +: counts :+
      Curation.redactPii(col("t")).as("red")): _*).orderBy("id").collect()
    assert(out(0).getString(4) ==
      "mail <EMAIL> and <EMAIL> call <PHONE> from <IP>")
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getLong(3)) == ((2L, 1L, 1L)))
    assert(out(1).getString(4) == "no pii here")
    assert(out(2).getString(4) == "edge <IP> <PHONE> end")
  }

  test("extractUrls strips trailing punctuation so blocklisted hosts cannot slip the flag") {
    val df = Seq((1L, "go to http://x.bad-ads.net, then\nhttps://ok.example.com/p.")).toDF("id", "t")
    val out = Curation.extractUrls(df, "id", col("t"), Seq(".bad-ads.net"))
      .orderBy("url_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("url_host") == "x.bad-ads.net") // not "x.bad-ads.net,"
    assert(out(0).getAs[Int]("blocked") == 1)
    assert(out(1).getAs[String]("url") == "https://ok.example.com/p") // newline ends the match
  }

  test("repetitionMetrics and decontaminate keep short docs as clean rows, not absent ones") {
    val short2 = Seq((1L, "a b"), (2L, "only"), (3L, "x y z w")).toDF("id", "t")
    val rep = Curation.repetitionMetrics(short2, "id", col("t")).orderBy("id").collect()
    assert(rep.length == 3) // 1- and 2-token docs still present
    assert(rep(1).getAs[Long]("n_2grams") == 0L)
    assert(rep(1).getAs[Int]("flagged") == 0)
    val decon = Curation.decontaminate(short2,
      Seq((0L, (1 to 12).map("e" + _).mkString(" "))).toDF("id", "t"),
      "id", col("t"), n = 8).orderBy("id").collect()
    assert(decon.length == 3) // all shorter than 8 tokens, all clean
    assert(decon.forall(r => r.getAs[Long]("n_grams") == 0L &&
      r.getAs[Int]("contaminated") == 0 && r.getAs[Double]("contam_frac") == 0.0))
  }

  test("extractUrls splits components and flags blocklisted hosts") {
    val df = Seq((7L, "x https://a.example.com/p/1?ref=r2 y http://bad.bad-ads.net/z t"))
      .toDF("id", "t")
    val out = Curation.extractUrls(df, "id", col("t"), Seq(".bad-ads.net"))
      .orderBy("url_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("url_host") == "a.example.com")
    assert(out(0).getAs[String]("url_path") == "/p/1")
    assert(out(0).getAs[String]("url_ref") == "r2")
    assert(out(0).getAs[Int]("blocked") == 0)
    assert(out(1).getAs[String]("url_host") == "bad.bad-ads.net")
    assert(out(1).getAs[String]("url_ref") == "")
    assert(out(1).getAs[Int]("blocked") == 1)
  }

  test("repetitionMetrics flags the repetitive doc, not the unique one") {
    val rep = ("a b " * 20).trim                 // one dominant 2-gram
    val uniq = (1 to 40).map(i => s"w$i").mkString(" ")
    val out = Curation.repetitionMetrics(
        Seq((1L, rep), (2L, uniq)).toDF("id", "t"), "id", col("t"))
      .orderBy("id").collect()
    assert(out(0).getAs[Int]("flagged") == 1)
    assert(out(0).getAs[Double]("dup_frac_2") > 0.9)
    assert(out(1).getAs[Int]("flagged") == 0)
    assert(out(1).getAs[Double]("dup_frac_2") == 0.0)
  }

  test("decontaminate: eval-identical doc is fully contaminated, fresh doc is clean") {
    val evalDoc = (1 to 12).map(i => s"e$i").mkString(" ")
    val fresh = (1 to 12).map(i => s"f$i").mkString(" ")
    val corpus = Seq((10L, evalDoc), (11L, fresh)).toDF("id", "t")
    val eval = Seq((0L, evalDoc)).toDF("id", "t")
    val out = Curation.decontaminate(corpus, eval, "id", col("t"), n = 8)
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("contam_frac") == 1.0)
    assert(out(0).getAs[Int]("contaminated") == 1)
    assert(out(1).getAs[Long]("n_matched") == 0L)
    assert(out(1).getAs[Int]("contaminated") == 0)
  }

  test("evalContamination: transposed direction — leaked eval doc flagged, partial overlap fractional, short doc clean") {
    val leaked = (1 to 12).map(i => s"e$i").mkString(" ")   // 5 distinct 8-grams
    val fresh = (1 to 12).map(i => s"f$i").mkString(" ")
    // half doc: tokens e1..e8 + x1..x4 — exactly one gram (e1..e8)
    // of its 5 appears in the corpus copy of `leaked`
    val half = ((1 to 8).map(i => s"e$i") ++ (1 to 4).map(i => s"x$i")).mkString(" ")
    val corpus = Seq((10L, leaked), (11L, "unrelated corpus words only")).toDF("id", "t")
    val eval = Seq((0L, leaked), (1L, fresh), (2L, half), (3L, "too short")).toDF("id", "t")
    val out = Curation.evalContamination(corpus, eval, "id", col("t"), n = 8)
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("contam_frac") == 1.0 && out(0).getAs[Int]("contaminated") == 1)
    assert(out(1).getAs[Long]("n_matched") == 0L && out(1).getAs[Int]("contaminated") == 0)
    assert(out(2).getAs[Long]("n_grams") == 5L && out(2).getAs[Long]("n_matched") == 1L,
      s"half-leaked doc: ${out(2)}")
    assert(out(3).getAs[Long]("n_grams") == 0L && out(3).getAs[Int]("contaminated") == 0,
      s"short eval doc is a CLEAN row, not absent: ${out(3)}")
    assert(out.length == 4)
  }

  test("evalContamination never sort-merge-joins: the corpus side only ever meets broadcasts") {
    val docs = Tables.load(spark, sfDir, "documents")
    val df = Curation.evalContamination(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0), "doc_id", col("text"), 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle into a join:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 3,
      s"eval-set semi, hits attach, and per-doc attach all broadcast:\n$plan")
  }

  test("decontaminate broadcasts the eval gram table") {
    val docs = Tables.load(spark, sfDir, "documents")
    val df = Curation.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0), "doc_id", col("text"), 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("mixingWeights: weights normalize to 1 and sqrt-temperature upweights small strata") {
    val df = Tables.load(spark, sfDir, "documents")
    val out = Curation.mixingWeights(df, col("source"), size(split(col("text"), " ")))
      .collect()
    val wSum = out.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    // sqrt temperature: smallest stratum gets upweight > 1, largest < 1
    val byShare = out.sortBy(_.getAs[Double]("share"))
    assert(byShare.head.getAs[Double]("upweight") > 1.0)
    assert(byShare.last.getAs[Double]("upweight") < 1.0)
  }

  test("redaction plan is a narrow projection — no Exchange") {
    val docs = Tables.load(spark, sfDir, "documents")
    val df = docs.select(col("doc_id"), Curation.redactPii(col("text")).as("red"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redaction must not shuffle:\n$plan")
  }

  test("decontaminateBloom is byte-identical to the exact path (no false negatives survive)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 97 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    val exact = rows(Curation.decontaminate(corpus, eval_, "doc_id", col("text"), n = 8))
    val bloom = rows(Curation.decontaminateBloom(corpus, eval_, "doc_id", col("text"), n = 8))
    assert(bloom == exact, "bloom-prefiltered output diverged from the exact path")
    assert(exact.exists(_._3 > 0), "fixture has no contaminated docs — test is vacuous")
  }

  test("decontaminateBloom: an aggressive fpp still yields exact output (confirm join catches FPs)") {
    // tiny filter (fpp=0.5) floods the prefilter with false positives;
    // the exact-confirm semi join must still remove every one
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 7 === 0)
    val exact = Curation.decontaminate(corpus, eval_, "doc_id", col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bloom = Curation.decontaminateBloom(corpus, eval_, "doc_id", col("text"),
        n = 3, expectedItems = 100, fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bloom == exact)
  }
}
