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
