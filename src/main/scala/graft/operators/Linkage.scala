package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution: fuzzy string matching with blocked candidate
  * generation. The naive formulation is an all-pairs CROSS JOIN with
  * an edit-distance filter — quadratic in distinct values and a
  * cartesian product in the plan. This operator works at the
  * distinct-value grain (the BPE-vocabulary trick: dedup values FIRST,
  * match once per value, carry the support count) and generates
  * candidates through length-band blocking, which is LOSSLESS for
  * Levenshtein distance: lev(a,b) >= |len(a)-len(b)|, so with bucket
  * width w >= maxDist every qualifying pair lands in the same or an
  * adjacent length bucket. Probing each value into its own bucket and
  * the next turns candidate generation into a plain equi-join —
  * hash-partitioned, broadcast-able, no cartesian anywhere.
  *
  * At 100 TB the distinct-value table is orders of magnitude smaller
  * than the corpus (names, titles, brands repeat); the quadratic term
  * is confined to within-bucket pairs. When length alone leaves hot
  * buckets, pass `extraBlock` (e.g. first token, phonetic key) to
  * sharpen blocking — documented recall tradeoff: pairs disagreeing on
  * that key are not compared.
  */
object Linkage {

  /** All unordered pairs of DISTINCT `textCol` values with Levenshtein
    * distance in [minDist, maxDist], plus each value's support count.
    *
    * Output: name_a < name_b (lexicographic orientation), dist,
    * cnt_a/cnt_b (input rows carrying each value). Exact with respect
    * to the naive all-pairs definition when `extraBlock` is None (the
    * length blocking is lossless); with `extraBlock` set, only pairs
    * agreeing on the key are compared.
    */
  def fuzzyPairs(
      df: DataFrame,
      textCol: String,
      maxDist: Int,
      minDist: Int = 1,
      extraBlock: Option[Column] = None): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(minDist >= 1 && minDist <= maxDist,
      s"minDist must be in [1, maxDist], got $minDist")

    val keyed = extraBlock match {
      case Some(k) => df.select(col(textCol).as("v"), k.cast("string").as("bk"))
      case None    => df.select(col(textCol).as("v"), lit("").as("bk"))
    }
    val vals = keyed.where(col("v").isNotNull)
      .groupBy(col("v"), col("bk")).agg(count(lit(1)).as("cnt"))
      .withColumn("lb", floor(length(col("v")) / maxDist))

    // Probe side visits its own bucket and the next; build side stays
    // put. Every |len diff| <= maxDist pair meets in exactly one or two
    // buckets; lexicographic orientation + distinct collapses the
    // double hit of same-bucket pairs.
    val probe = vals.withColumn("b", explode(array(col("lb"), col("lb") + 1)))
      .select(col("v").as("v1"), col("cnt").as("cnt1"), col("bk"), col("b"))
    val build = vals
      .select(col("v").as("v2"), col("cnt").as("cnt2"), col("bk"), col("lb").as("b"))

    val d = levenshtein(col("v1"), col("v2"))
    probe.join(build, Seq("bk", "b"))
      .where(col("v1") =!= col("v2") && d.between(minDist, maxDist))
      .select(
        least(col("v1"), col("v2")).as("name_a"),
        greatest(col("v1"), col("v2")).as("name_b"),
        d.cast("long").as("dist"),
        when(col("v1") <= col("v2"), col("cnt1")).otherwise(col("cnt2")).as("cnt_a"),
        when(col("v1") <= col("v2"), col("cnt2")).otherwise(col("cnt1")).as("cnt_b"))
      .distinct()
  }

  /** Best-match linkage (canonicalization): every distinct `dirtyCol`
    * value mapped to its closest `catalogCol` value within `maxDist`
    * Levenshtein — ties break on (distance, catalog value), so the
    * match is deterministic. Values already in the catalog map to
    * themselves at distance 0; values with no catalog entry within
    * budget surface with null match (production wants the unmatched
    * list, not a silent drop).
    *
    * Same distinct-value-grain + lossless length-band blocking as
    * fuzzyPairs; because the pairing is directed, the CATALOG side is
    * replicated into the three adjacent buckets (it is the small
    * side — a canonical vocabulary) and the dirty side probes its own
    * bucket only.
    *
    * Output: value, cnt (dirty support count), match, dist (null
    * when unmatched).
    */
  def linkBest(
      dirty: DataFrame,
      catalog: DataFrame,
      dirtyCol: String,
      catalogCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")

    val d = dirty.where(col(dirtyCol).isNotNull)
      .groupBy(col(dirtyCol).as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("b", floor(length(col("v")) / maxDist))
    val c = catalog.where(col(catalogCol).isNotNull)
      .select(col(catalogCol).as("m")).distinct()
      .withColumn("cb", floor(length(col("m")) / maxDist))
      .withColumn("b", explode(array(col("cb") - 1, col("cb"), col("cb") + 1)))
      .drop("cb")

    val dist = levenshtein(col("v"), col("m"))
    val best = d.join(c, Seq("b"))
      .where(dist <= maxDist)
      .select(col("v"), col("m"), dist.cast("long").as("dist"))
      .groupBy(col("v"))
      .agg(min(struct(col("dist"), col("m"))).as("_best"))
      .select(col("v"), col("_best.m").as("match"), col("_best.dist").as("dist"))

    d.select(col("v").as("value"), col("cnt"))
      .join(best.withColumnRenamed("v", "value"), Seq("value"), "left_outer")
  }
}
