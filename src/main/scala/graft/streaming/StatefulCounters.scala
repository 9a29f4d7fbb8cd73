package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state on a stream: running per-(source, type) IOC totals via
  * `flatMapGroupsWithState` — the Structured-Streaming re-expression of the
  * reference's cross-run counters (meta.json `iocs{ips,…}`,
  * /root/reference/h-isac.py:125-139,170-179), upgraded from a driver-side
  * JSON file to partitioned, checkpointed state that survives restarts and
  * scales with executors (SURVEY.md §2.9 "stateful ops").
  *
  * Used where `observe()` (per-batch metrics) isn't enough — when the
  * running total itself must be emitted downstream per key.
  */
object StatefulCounters {

  final case class KeyCount(source: String, iocType: String, total: Long)

  /** iocs: the canonical IOC frame (streaming). Emits one updated running
    * total per (source, type) per micro-batch in which the key appears. */
  def runningTotals(spark: SparkSession,
                    iocs: Dataset[org.apache.spark.sql.Row]): Dataset[KeyCount] = {
    import spark.implicits._
    iocs.selectExpr("source", "type").as[(String, String)]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, String), rows: Iterator[(String, String)],
         state: GroupState[Long]) => {
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          Iterator(KeyCount(key._1, key._2, next))
        })
  }
}
