package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state exemplar (SURVEY.md §2 B36): the size-governor
  * semantics of lambda/main.py:137-151 generalized to CROSS-batch
  * state per key — a running byte budget that marks records Dropped
  * once a key's cumulative size exceeds its quota.
  *
  * The reference never needs this (its governor is batch-local by
  * construction), but a 100 TB pipeline enforcing per-tenant quotas
  * does; state lives in the streaming state store, partitioned by key,
  * checkpointed with the query.
  */
object StatefulOps {

  case class Keyed(key: String, size: Long)
  case class QuotaResult(key: String, accepted: Long, dropped: Long, used: Long)

  /** mapGroupsWithState update function: fold this batch's sizes into
    * the running total, accepting until the quota is exhausted.
    */
  def updateQuota(quota: Long)(
      key: String, values: Iterator[Keyed], state: GroupState[Long]): QuotaResult = {
    var used = state.getOption.getOrElse(0L)
    var accepted = 0L
    var dropped = 0L
    values.foreach { v =>
      if (used + v.size <= quota) { used += v.size; accepted += 1 }
      else dropped += 1
    }
    state.update(used)
    QuotaResult(key, accepted, dropped, used)
  }

  /** Wire the quota governor over a stream of (key, size) records. */
  def quotaGovernor(records: Dataset[Keyed], quota: Long): Dataset[QuotaResult] = {
    import records.sparkSession.implicits._
    records.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateQuota(quota))
  }

  case class Decision(key: String, size: Long, accepted: Boolean, usedAfter: Long)

  /** flatMapGroupsWithState variant: emit one PER-RECORD admission
    * decision instead of a per-key batch summary (the shape needed when
    * downstream routing must act on individual records, like the
    * reference's per-record Dropped marking).
    */
  def quotaDecisions(records: Dataset[Keyed], quota: Long): Dataset[Decision] = {
    import records.sparkSession.implicits._
    records.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, values: Iterator[Keyed], state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val out = values.map { v =>
            val ok = used + v.size <= quota
            if (ok) used += v.size
            Decision(key, v.size, ok, used)
          }.toVector
          state.update(used)
          out.iterator
      }
  }
}
