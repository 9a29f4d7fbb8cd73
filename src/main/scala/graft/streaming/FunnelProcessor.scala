package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of the batch funnel automaton
  * ([[graft.operators.Events]] `events_funnel`): per-user view→click→
  * purchase state advanced by the IDENTICAL transition rules, held in a
  * `transformWithState` ValueState so the fold survives across
  * micro-batches (and, via the state store, across restarts).
  *
  * Ordering contract: the batch fold sorts each user's events by
  * (ts, event_type) before folding; a stream cannot re-order history it
  * has already consumed, so the twin sorts WITHIN each micro-batch by the
  * same key and relies on the ordered-log premise across batches (the
  * replay/Kafka-per-key-ordered deployment the suite's other streaming
  * twins document). Under that premise the per-user end state is
  * batch-identical regardless of where the batch boundaries fall — the
  * parity test cuts the log at an arbitrary point and asserts exactly
  * that.
  *
  * Memory bound: the per-key batch is folded in fixed [[FoldChunk]]-sized
  * chunks (each chunk sorted locally) rather than materialized whole, so
  * a hot user key buffers at most FoldChunk rows on its task. A chunk
  * boundary has exactly the semantics of a micro-batch boundary — under
  * the ordered-log premise the chunk-local sort is a no-op and the result
  * is identical; on a premise-violating (out-of-order) feed, disorder
  * across a chunk cut degrades the same way disorder across a batch cut
  * already does.
  *
  * Input rows are (user_id, ts_micros, event_type); emission is the
  * current per-user automaton state each batch (Update mode), `None`
  * components for stages not yet reached; users with no view yet emit
  * nothing, matching the batch query's `tv IS NOT NULL` filter.
  */
class FunnelProcessor
    extends StatefulProcessor[
      Long, (Long, Long, String), (Long, Option[Long], Option[Long], Option[Long], Long)] {

  // (tv, tc, tp) in epoch micros; Long.MinValue = not reached
  @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)](
      "funnel", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  private val Unset = Long.MinValue
  private val FoldChunk = 1 << 16 // max rows a hot key may buffer per task

  override def handleInputRows(
      key: Long,
      inputRows: Iterator[(Long, Long, String)],
      timerValues: TimerValues): Iterator[(Long, Option[Long], Option[Long], Option[Long], Long)] = {
    var (tv, tc, tp) = if (st.exists()) st.get() else (Unset, Unset, Unset)
    // same within-chunk order as the batch fold's sort_array(struct(ts, et));
    // chunking bounds memory (see scaladoc) — a chunk cut ≡ a batch cut
    inputRows.grouped(FoldChunk).foreach { chunk =>
      chunk.sortBy(r => (r._2, r._3)).foreach { case (_, ts, et) =>
        if (et == "view" && tv == Unset) tv = ts
        else if (et == "click" && tv != Unset && tc == Unset && ts > tv) tc = ts
        else if (et == "purchase" && tc != Unset && tp == Unset && ts > tc) tp = ts
      }
    }
    st.update((tv, tc, tp))
    if (tv == Unset) Iterator.empty
    else {
      val stage = 1L + (if (tc != Unset) 1L else 0L) + (if (tp != Unset) 1L else 0L)
      Iterator.single((key,
        Some(tv),
        if (tc != Unset) Some(tc) else None,
        if (tp != Unset) Some(tp) else None,
        stage))
    }
  }
}
