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
}
