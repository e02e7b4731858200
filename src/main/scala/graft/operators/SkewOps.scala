package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins (SURVEY.md §2 note on
  * salting). Spark 4's AQE skew-join handles most cases at runtime;
  * the explicit salt is for the regimes AQE cannot fix — a single
  * logical key whose rows exceed one executor's memory, or
  * deterministic plans where runtime re-planning is disabled.
  *
  * Shape: the probe (large, skewed) side gets a uniform salt in
  * [0, buckets); the build side is replicated `buckets` times via
  * explode. The join key becomes (key, salt) — one hot key spreads
  * over `buckets` reducers. Row multiplicity is unchanged: each probe
  * row matches exactly the one build replica with its salt.
  */
object SkewOps {

  /** Deterministic salt: spread rows of the same key by a stable hash
    * of a distinguishing column (NOT rand() — keeps retries/replays
    * idempotent, which matters for exactly-once sinks).
    */
  def salt(distinguisher: Column, buckets: Int): Column =
    pmod(hash(distinguisher), lit(buckets))

  /** Inner equi-join with the probe side salted and the build side
    * replicated. `probeDistinct` is any probe column that varies
    * within a key (a row id) so the salt spreads evenly.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      probeDistinct: Column, buckets: Int = 8): DataFrame = {
    val saltedProbe = probe.withColumn("_salt", salt(probeDistinct, buckets))
    val replicatedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, "_salt")).drop("_salt")
  }

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * NON-NEGATIVE integer dimensions — x in the even output bits, y in
    * the odd. Sorting/range-partitioning a table by this key clusters
    * BOTH dimensions simultaneously, so per-file min/max statistics
    * prune multi-dimensional range queries — the data-layout move
    * behind Delta/Iceberg OPTIMIZE ZORDER, applied here as a plain
    * sort key for `write.sortWithinPartitions`/`repartitionByRange`.
    * SkewSpec measures the effect: a 2-D range query skips strictly
    * more row-blocks under the z-sort than under a single-dimension
    * sort.
    *
    * Pure integer arithmetic ((x div 2^i) mod 2) * 2^(2i), no shifts
    * or bit intrinsics — a narrow codegen'd expression any engine
    * replays exactly (q136). Dimensions wider than `bits` bits should
    * be range-bucketed first (the usual z-order practice). Negative
    * inputs are clamped to 0 — `%` on a negative long would emit
    * negative bit terms and silently corrupt the interleave; clamping
    * keeps the key monotone at the domain edge instead.
    */
  def zorderKey2(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    // exact long division via Catalyst IntegralDivide (SQL `div`) —
    // Spark's `/` on longs is a double divide, inexact past 2^53
    def bitAt(c: Column, i: Int): Column = {
      val cl = greatest(c.cast("long"), lit(0L))
      (graft.functions.intmath.ldiv(cl, lit(1L << i)) % 2)
    }
    (0 until bits).map { i =>
      bitAt(x, i) * lit(1L << (2 * i)) + bitAt(y, i) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }
}
