package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of the batch funnel automaton
  * ([[graft.operators.Events]] `events_funnel`): per-user view→click→
  * purchase state advanced to the IDENTICAL end state, held in a
  * `transformWithState` ValueState so the fold survives across
  * micro-batches (and, via the state store, across restarts).
  *
  * Ordering contract — none needed. The batch fold sorts each user's
  * events by (ts, event_type) and folds with strict-`>` transitions;
  * that end state is a pure function of the event MULTISET:
  *
  *   tv = min view ts                 (if not already set)
  *   tc = min { click ts    : ts > tv }  (if not already set)
  *   tp = min { purchase ts : ts > tc }  (if not already set)
  *
  * (In the sorted fold, tv is set at the minimal-ts view; every click
  * with ts > tv sorts after it, so the first taken is the min; same
  * argument for purchases over tc. Ties at ts == tv / ts == tc are
  * excluded by the strict `>` either way.) The processor therefore
  * computes those three mins directly, which makes it immune to the
  * arbitrary within-key row order the groupByKey shuffle delivers —
  * a prior revision sorted chunk-locally and was only correct when a
  * key's batch fit one chunk; this formulation needs no sort at all.
  *
  * ACROSS batches the contract is weaker but not empty: a committed
  * stage never moves down (the stream cannot revisit state), so end-state
  * parity with the batch fold over the union holds iff no later batch
  * delivers an event that would have resolved an already-committed stage
  * earlier — e.g. a view below the committed tv. That is the per-key
  * ordered-log premise (replay / Kafka per-key ordering) the suite's
  * other streaming twins document; the parity spec cuts an ordered log
  * at an arbitrary boundary and shuffles freely within each cut.
  *
  * Memory bound: O(1) per key once the funnel has advanced past the
  * stage a row feeds. Views never buffer. Clicks buffer only while the
  * user has never viewed, only at-or-below the running min-view, and
  * only strictly below cCand (a click ≥ cCand can never be the min
  * qualifying click); purchases buffer only while the click stage is
  * unresolved and only at-or-below cCand (anything above it qualifies
  * for every possible tc ≤ cCand and is summarized by the single
  * running min pHigh). Both buffers compact in place on doubling past
  * 2^16 entries, so per-task memory is ≤ 2× the live candidates. The
  * residual worst case — a key whose batch contains no qualifying
  * click candidate at all — buffers that batch's clicks+purchases,
  * still strictly below the batch twin's collect_list of ALL events
  * per key.
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

  @inline private def minU(a: Long, b: Long): Long =
    if (a == Unset) b else if (b == Unset) a else math.min(a, b)

  override def handleInputRows(
      key: Long,
      inputRows: Iterator[(Long, Long, String)],
      timerValues: TimerValues): Iterator[(Long, Option[Long], Option[Long], Option[Long], Long)] = {
    var (tv, tc, tp) = if (st.exists()) st.get() else (Unset, Unset, Unset)
    val tvKnown = tv != Unset // threshold for clicks fixed before the batch
    val tcKnown = tc != Unset // threshold for purchases fixed before the batch

    var minView = Unset // min view ts in this batch (only needed while !tvKnown)
    var cCand = Unset   // min qualifying click: vs fixed tv, or provably > any final tv
    var pCand = Unset   // min qualifying purchase vs fixed tc
    var pHigh = Unset   // min purchase > cCand: qualifies whatever tc resolves to (tc ≤ cCand)
    var clicks: ArrayBuffer[Long] = null    // clicks ≤ running minView AND < cCand
    var purchases: ArrayBuffer[Long] = null // purchases ≤ cCand while tc is unresolved

    // Buffer bounds. A click ≥ cCand can never be the min qualifying
    // click (cCand already qualifies and is no larger), so it is never
    // appended — and because cCand only DECREASES during the scan, stale
    // entries above it accrue; compaction re-filters in place whenever
    // the buffer doubles past CompactAt (amortized O(batch), memory ≤
    // 2× live candidates). Purchases symmetrically: once cCand is set,
    // final tc ≤ cCand, so purchases > cCand are summarized by the one
    // running min pHigh and only purchases ≤ cCand buffer; compaction
    // folds entries that cCand has since dropped below into pHigh. The
    // residual worst case — a key with NO qualifying click candidate
    // (e.g. clicks all at-or-below every view seen so far) — still
    // buffers that key's whole batch, but such rows can never resolve a
    // stage either; that pathological shape is the documented cap here,
    // strictly below the batch twin's collect_list of ALL events per key.
    val CompactAt = 1 << 16
    var clicksCap = CompactAt
    var purchasesCap = CompactAt

    inputRows.foreach { case (_, ts, et) =>
      if (et == "view") {
        if (!tvKnown && (minView == Unset || ts < minView)) minView = ts
      } else if (et == "click") {
        if (!tcKnown) {
          if (tvKnown) { if (ts > tv) cCand = minU(cCand, ts) }
          else if (minView != Unset && ts > minView) {
            // final tv ≤ current minView < ts, so this click qualifies
            // whatever the final tv turns out to be — running min suffices
            cCand = minU(cCand, ts)
          } else if (cCand == Unset || ts < cCand) {
            if (clicks == null) clicks = new ArrayBuffer[Long]
            clicks += ts
            if (clicks.length >= clicksCap && cCand != Unset) {
              clicks.filterInPlace(_ < cCand)
              clicksCap = math.max(CompactAt, clicks.length * 2)
            }
          }
        }
      } else if (et == "purchase") {
        if (tp == Unset) {
          if (tcKnown) { if (ts > tc) pCand = minU(pCand, ts) }
          else if (cCand != Unset && ts > cCand) pHigh = minU(pHigh, ts)
          else {
            if (purchases == null) purchases = new ArrayBuffer[Long]
            purchases += ts
            if (purchases.length >= purchasesCap && cCand != Unset) {
              purchases.foreach(p => if (p > cCand) pHigh = minU(pHigh, p))
              purchases.filterInPlace(_ <= cCand)
              purchasesCap = math.max(CompactAt, purchases.length * 2)
            }
          }
        }
      }
    }

    // resolve stages in dependency order: tv, then tc over it, then tp
    if (!tvKnown && minView != Unset) tv = minView
    if (!tcKnown && tv != Unset) {
      var c = cCand
      if (clicks != null) clicks.foreach(ts => if (ts > tv) c = minU(c, ts))
      tc = c
    }
    if (tp == Unset && !tcKnown && tc != Unset) {
      var p = pHigh // pHigh > cCand ≥ tc, so it always qualifies when set
      if (purchases != null) purchases.foreach(ts => if (ts > tc) p = minU(p, ts))
      tp = p
    } else if (tp == Unset && tcKnown) tp = pCand

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
