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
  /** Shared bounded pool for OVERLAPPING independent Spark actions
    * (guide §2.6 "overlap independent jobs", optimization round 19).
    * One JVM-wide lazy pool instead of a pool per call site: the
    * round-18 review flagged FirehoseDelivery's per-micro-batch
    * Executors.newFixedThreadPool (allocation + teardown every 200 ms
    * trigger), and round 19 adds a second user (the pretraining
    * spine's independent stage materializations). Four threads: the
    * widest legitimate fan-out is FirehoseDelivery's 3 sinks + the
    * re-ingest leg; more would just contend for executor slots
    * (guide: "2-3 jobs in flight is plenty"). Daemon threads so the
    * pool never blocks JVM shutdown.
    */
  private[graft] lazy val overlapPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4,
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-overlap-${n.getAndIncrement()}")
            t.setDaemon(true)
            t
          }
        }))

  /** Spark scheduler properties are THREAD-LOCAL (job group, job
    * description, the SQL execution id, the streaming query tag); a
    * per-call-site pool used to inherit them implicitly because its
    * threads were created by the submitting thread
    * (InheritableThreadLocal clones at Thread construction). A shared
    * pool's threads are created by whoever submits first, so the
    * inherited snapshot can belong to a DIFFERENT caller — e.g. sink
    * jobs of streaming query B carrying query A's job group, which
    * `StreamingQuery.stop()`'s group-cancel would then miss. This
    * wrapper restores the implicit-inheritance semantics explicitly:
    * it snapshots the caller's scheduler keys at submit time and
    * installs them on the worker thread before the body runs.
    */
  private val inheritedKeys = Seq(
    "spark.jobGroup.id", "spark.job.description",
    "spark.job.interruptOnCancel", "spark.sql.execution.id",
    "sql.streaming.queryId", "__is_continuous_processing")

  private[graft] def inheritedFuture[A](
      sc: org.apache.spark.SparkContext)(body: => A): scala.concurrent.Future[A] = {
    val saved = inheritedKeys.map(k => k -> sc.getLocalProperty(k))
    scala.concurrent.Future {
      saved.foreach { case (k, v) => sc.setLocalProperty(k, v) }
      body
    }(overlapPool)
  }

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
