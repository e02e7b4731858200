package graft.operators

import org.apache.spark.sql.Dataset

/** Parallelism repair for NARROW per-row-heavy stages (optimization
  * round 18, guide §2.5 "input skew"): the bench corpus ships each
  * table as ONE parquet row group, so every scan plans as ONE task and
  * any expensive per-row stage composed onto it (ImageIO/JPEG decode,
  * G.711/ADPCM codecs, PII regexes, C4 line lambdas) runs on a single
  * core no matter how many the session has. The guide's remedy for an
  * unsplittable input is to repartition immediately after the read —
  * but ONLY then: a corpus-scale input already carries at least as
  * many row groups as the cluster has slots, and an unconditional
  * repartition would shuffle every payload for nothing. `widen` is
  * therefore GATED on the planned partition count: it round-robin
  * repartitions to the session's default parallelism exactly when the
  * feed plans below it, and is a no-op otherwise. Row values never
  * depend on partitioning (per-row compute; round-robin placement is
  * deterministic under spark.sql.execution.sortBeforeRepartition, the
  * default), so results are unchanged.
  */
object Par {
  private[graft] def widen[T](ds: Dataset[T]): Dataset[T] = {
    val target = ds.sparkSession.sparkContext.defaultParallelism
    // a feed whose plan already carries an Exchange is spread by that
    // shuffle — and probing `.rdd` through it would make AQE
    // materialize the upstream stages eagerly. Only the truly narrow
    // case (scan + projections) reads its partition count, which
    // plans without running anything.
    val hasExchange = ds.queryExecution.sparkPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
      .isDefined
    if (hasExchange) ds
    else if (ds.rdd.getNumPartitions < target) ds.repartition(target)
    else ds
  }
}
