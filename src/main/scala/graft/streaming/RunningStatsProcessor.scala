package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Spark 4 `transformWithState` showcase: per-key running IOC counters on
  * the new arbitrary-state API (the successor to mapGroupsWithState /
  * flatMapGroupsWithState, which [[StatefulCounters]] keeps for the legacy
  * surface). Differences that matter at scale: typed state handles
  * (ValueState/ListState/MapState) live in the state STORE, not in a
  * single user object per key — so a key's state can grow without
  * round-tripping one opaque blob per trigger — and TTL is declarative
  * (`TTLConfig`) instead of hand-rolled timeout bookkeeping.
  *
  * Emits (key, total, max_value) per key per micro-batch — the streaming
  * twin of a running `groupBy(key).agg(count, max)`.
  */
class RunningStatsProcessor
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {

  @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _
  @transient private var maxV: org.apache.spark.sql.streaming.ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    maxV = getHandle.getValueState[Double]("maxV", Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      inputRows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var n = if (count.exists()) count.get() else 0L
    var mx = if (maxV.exists()) maxV.get() else Double.NegativeInfinity
    inputRows.foreach { case (_, v) =>
      n += 1
      if (v > mx) mx = v
    }
    count.update(n)
    maxV.update(mx)
    Iterator.single((key, n, mx))
  }
}
