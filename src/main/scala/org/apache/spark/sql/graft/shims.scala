package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to `private[sql]` Column<->Expression conversions (the classic
  * `new Column(expr)` constructor was removed in Spark 4's split of the
  * Column API into sql-api ColumnNodes).
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Replace a checkpointed frame's carried-over stats ESTIMATE with
    * measured ones (MEASURED, round 13): `Dataset.localCheckpoint`
    * builds a LogicalRDD whose `originStats` is the stats of the plan
    * it truncates — even when EAGER, i.e. even after the data was
    * fully materialized. Iterative loops that join a chain against
    * frames derived from the chain itself therefore COMPOUND the
    * estimate across rounds no matter how they checkpoint (join size
    * estimates multiply: measured ~3x bit-length per round on kCore's
    * incremental-degree shape — plan-time BigInteger blowup by round
    * ~15), so the only firebreak is to overwrite `originStats` with
    * stats of the MATERIALIZED rdd. The caller supplies the measured
    * rowCount (one cached-scan count job) and a sizeInBytes derived
    * from it; broadcast decisions then keep working (a no-stats
    * LogicalRDD would fall back to defaultSizeInBytes = never
    * broadcast). No-op on frames that are not checkpointed
    * LogicalRDDs.
    */
  /** Actual cached bytes of a checkpointed frame's materialized RDD
    * (mem + disk, from the driver's block-manager registry — metadata
    * only, no job). None when the frame is not a LogicalRDD or its
    * blocks are not (fully) materialized yet — i.e. for LAZY
    * checkpoints before their first action. This is what lets
    * [[withMeasuredStats]] callers carry honest sizes for
    * VARIABLE-WIDTH schemas (string ids in connectedComponents),
    * where rowCount x defaultSize is a fixed guess that can
    * underestimate drastically and mis-broadcast (round-13 ADVICE).
    */
  def materializedSizeInBytes(df: DataFrame): Option[Long] =
    df.queryExecution.logical match {
      case l: LogicalRDD =>
        df.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .filter(i => i.isCached &&
            i.numCachedPartitions == l.rdd.getNumPartitions)
          .map(i => math.max(i.memSize + i.diskSize, 1L))
      case _ => None
    }

  def withMeasuredStats(df: DataFrame, sizeInBytes: BigInt,
      rowCount: BigInt): DataFrame =
    df.queryExecution.logical match {
      case l: LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val stats = Statistics(sizeInBytes = sizeInBytes.max(1),
          rowCount = Some(rowCount.max(0)))
        val nl = LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(
          spark, Some(stats), None)
        org.apache.spark.sql.classic.Dataset.ofRows(spark, nl)
      case _ => df
    }
}
