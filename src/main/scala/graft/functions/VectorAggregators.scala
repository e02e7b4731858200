package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator exemplar (SURVEY.md §2 B46): per-group centroid of
  * fixed-dimension embedding vectors. The buffer is a mutable running
  * (sum-vector, count) pair — merged associatively across partitions,
  * so the aggregation distributes with map-side partials like any
  * built-in agg.
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (sx, nx) = x
    val (sy, ny) = y
    var i = 0
    while (i < dim) { sx(i) += sy(i); i += 1 }
    (sx, nx + ny)
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] = {
    val (sums, n) = b
    if (n == 0) Seq.fill(dim)(0.0) else sums.map(_ / n).toSeq
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    // native unsafe-array encoding — the buffer crosses the map-side
    // partial -> shuffle -> merge boundary on every group, so Java
    // serialization here would dominate the aggregation cost
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Cross-covariance block for the OPQ Procrustes solve: accumulates
  * `M_s = sum over rows of a b^T` (row-major flat, `aDim x bDim`)
  * where `a` is the ORIGINAL vector and `b` the matched codebook
  * sub-vector of one subspace. Same flat-primitive-array-buffer
  * pattern as [[CentroidAggregator]] — mutated in place on the
  * map side, merged elementwise across partitions, so the only thing
  * that crosses the shuffle per group is one aDim*bDim double array
  * (64x8 = 4 KB), never row data.
  */
class OuterProductAggregator(aDim: Int, bDim: Int)
    extends Aggregator[(Seq[Double], Seq[Double]), Array[Double], Seq[Double]] {

  override def zero: Array[Double] = new Array[Double](aDim * bDim)

  override def reduce(m: Array[Double], v: (Seq[Double], Seq[Double])): Array[Double] = {
    val (a, b) = v
    var i = 0
    while (i < aDim && i < a.length) {
      val ai = a(i)
      var j = 0
      while (j < bDim && j < b.length) { m(i * bDim + j) += ai * b(j); j += 1 }
      i += 1
    }
    m
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(m: Array[Double]): Seq[Double] = m.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
