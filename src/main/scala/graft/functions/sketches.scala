package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed Aggregator — the
  * bounded-memory path to "top-k frequent items" when the key space is
  * too large to exact-count (URL hosts, n-grams, user agents at
  * 100 TB: an exact groupBy shuffles one partial per DISTINCT key;
  * this shuffles one `capacity`-entry summary per map task,
  * independent of the key cardinality).
  *
  * Algorithm (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *  - reduce: increment a tracked key; if untracked and a slot is
  *    free, track it at 1; else decrement ALL counters, dropping
  *    zeros (the classic k-counter step);
  *  - merge: sum counts keywise, then subtract the (capacity+1)-th
  *    largest count from every entry and drop the non-positive ones —
  *    the result is a valid MG summary of the combined stream.
  *
  * Guarantees: any item with true count > N/(capacity+1) survives in
  * the summary, and every reported count underestimates the true count
  * by at most N/(capacity+1) (N = stream length). With capacity >=
  * the number of distinct items no decrement ever fires and every
  * count is EXACT and partition-order-independent — the regime the
  * DuckDB oracle checks (q100); the error bound under eviction is
  * asserted separately in SketchSpec, because under eviction the
  * surviving key SET may depend on partition order (the bound, not the
  * exact summary, is the algorithm's contract).
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < capacity => b.updated(x, 1L)
      case None =>
        // decrement-all: one shared "charge" against every tracked key
        b.iterator
          .map { case (k, c) => (k, c - 1) }
          .filter(_._2 > 0)
          .toMap
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val summed = y.foldLeft(x) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count, drop <= 0: ties at
      // the boundary value all reach 0 and drop together, so the
      // result does not depend on map iteration order
      val kth = summed.valuesIterator.toArray.sortBy(-_).apply(capacity)
      summed.iterator
        .map { case (k, c) => (k, c - kth) }
        .filter(_._2 > 0)
        .toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a
  * typed Aggregator — the point-frequency sibling of
  * [[MisraGriesAggregator]] (which answers "which items are heavy";
  * this answers "how often did THIS item occur" for any item, in
  * `depth x width` longs regardless of key cardinality — the
  * bounded-shuffle estimate for URL/n-gram/user-agent frequencies at
  * 100 TB).
  *
  * Each of `depth` rows hashes the key into `width` counters with an
  * md5-derived hash (the repo's hash48 convention, so any engine
  * replays it); reduce increments one cell per row, merge is
  * ELEMENTWISE SUM. Unlike MG/KLL there is no eviction and no
  * compaction: the final matrix is a pure multiset function of the
  * stream on EVERY input — partition- and merge-order-independent in
  * all regimes, which is why the DuckDB oracle hash-checks the full
  * counter matrix (q148), not just an exact regime.
  *
  * Estimate(key) = min over rows of the key's cell — always >= the
  * true count (cells only ever add collisions); with width w the
  * expected overcount per row is N/w and the min over `depth`
  * independent rows concentrates sharply (SketchSpec asserts the
  * one-sided bound and cross-partitioning determinism).
  */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Seq[Long]]] {
  require(depth > 0 && width > 0, s"need depth > 0, width > 0; got ($depth, $width)")

  // flat depth x width buffer, mutated in place (the Aggregator
  // contract permits returning the mutated input) — the per-row hot
  // path allocates nothing but the digest copy
  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], key: String): Array[Long] = {
    var i = 0
    while (i < depth) {
      b(i * width + CountMinAggregator.cell(i, key, width)) += 1L
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Seq[Seq[Long]] =
    (0 until depth).map(i => b.slice(i * width, (i + 1) * width).toSeq)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Seq[Long]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Seq[Long]]]()
}

object CountMinAggregator {
  // MessageDigest is not thread-safe and getInstance per call costs
  // more than the digest itself on the per-row hot path
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Row-i cell for a key: md5 12-hex-prefix (48-bit, the hash48
    * convention) of "i_key", mod width — `CAST(concat('0x',
    * substr(md5(i || '_' || key), 1, 12)) AS BIGINT) % width` in SQL.
    */
  def cell(i: Int, key: String, width: Int): Int = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s"${i}_$key".getBytes("UTF-8"))
    // first 6 bytes == the 12-hex-char prefix, as an unsigned 48-bit int
    var h = 0L
    var j = 0
    while (j < 6) { h = (h << 8) | (bytes(j) & 0xffL); j += 1 }
    (h % width).toInt
  }

  /** Point-frequency estimate from a finished sketch. */
  def estimate(sketch: Seq[Seq[Long]], key: String): Long = {
    val width = sketch.head.length
    sketch.zipWithIndex.map { case (row, i) => row(cell(i, key, width)) }.min
  }
}

/** One-pass mergeable quantile sketch — the streaming/approximate
  * sibling of the exact two-pass [[graft.operators.Quantiles]] (q76).
  * A KLL-style compactor hierarchy (Karnin-Lang-Liberty, FOCS 2016)
  * made fully DETERMINISTIC: level i holds items of weight 2^i, and
  * when a level overflows `capacity` its sorted items pair up and the
  * odd-index (larger) element of each pair is promoted with doubled
  * weight — a fixed selector instead of KLL's coin flip. Each
  * compaction is thus a pure function of its level's sorted content
  * (no RNG anywhere); under compaction the summary still depends on
  * the merge-tree shape, like any mergeable sketch, but the ERROR
  * BOUND holds for every shape, and in the no-compaction regime
  * (capacity >= n) the result is fully multiset-determined.
  *
  * Error: within one compaction, promoted pairs are ADJACENT in sorted
  * order, so a rank query's threshold straddles at most one pair —
  * each compaction contributes at most its weight in rank error;
  * summed over ~n/capacity compactions per level and log2(n/capacity)
  * levels the rank error stays a small fraction of n for
  * capacity >> log n (SketchSpec asserts <= 2% at n=60k, capacity
  * 256). With capacity >= n no compaction fires and every quantile is
  * EXACT — the regime the DuckDB oracle hash-checks (q105).
  *
  * finish() returns the values at ranks floor(p*(W-1))+1 (1-based,
  * weighted) for the requested `ps` — the same rank-select definition
  * the oracle SQL spells out with row_number.
  */
class QuantileSketchAggregator(capacity: Int, ps: Seq[Double])
    extends Aggregator[Double, Seq[Seq[Double]], Seq[Double]] {
  require(capacity >= 2, s"capacity must be >= 2, got $capacity")
  require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
    s"fractions must be in [0, 1]: $ps")

  override def zero: Seq[Seq[Double]] = Seq(Vector.empty)

  override def reduce(b: Seq[Seq[Double]], v: Double): Seq[Seq[Double]] = {
    // hot per-row path: only level 0 can overflow from a single append,
    // so skip the full level scan unless it actually did
    val l0 = b.head :+ v
    val updated = b.updated(0, l0)
    if (l0.length > capacity) compactAll(updated) else updated
  }

  override def merge(x: Seq[Seq[Double]], y: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    val levels = math.max(x.length, y.length)
    compactAll((0 until levels).map { i =>
      val a = if (i < x.length) x(i) else Vector.empty
      val b = if (i < y.length) y(i) else Vector.empty
      a ++ b
    })
  }

  /** Cascade: compact any level over capacity, promoting half its
    * items (odd indices of the sorted run) to the next level; an odd
    * leftover (the unpaired largest) stays put. Terminates because
    * each pass halves the overflowing level.
    */
  private def compactAll(b: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    var levels = b.toVector
    var i = 0
    while (i < levels.length) {
      if (levels(i).length > capacity) {
        val sorted = levels(i).sorted
        val nPairs = sorted.length / 2
        val promoted = (0 until nPairs).map(j => sorted(2 * j + 1))
        val leftover =
          if (sorted.length % 2 == 1) Vector(sorted.last) else Vector.empty[Double]
        levels = levels.updated(i, leftover)
        if (i + 1 >= levels.length) levels = levels :+ Vector.empty[Double]
        levels = levels.updated(i + 1, levels(i + 1) ++ promoted)
      }
      i += 1
    }
    levels
  }

  override def finish(b: Seq[Seq[Double]]): Seq[Double] = {
    val weighted = b.zipWithIndex.flatMap { case (vs, lvl) =>
      val w = 1L << lvl
      vs.map(v => (v, w))
    }.sortBy(_._1)
    val total = weighted.iterator.map(_._2).sum
    if (total == 0L) return ps.map(_ => Double.NaN)
    ps.map { p =>
      val rank = math.floor(p * (total - 1)).toLong + 1
      var cum = 0L
      var ans = weighted.last._1
      val it = weighted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        cum += w
        if (cum >= rank) { ans = v; found = true }
      }
      ans
    }
  }

  override def bufferEncoder: Encoder[Seq[Seq[Double]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Seq[Double]]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
