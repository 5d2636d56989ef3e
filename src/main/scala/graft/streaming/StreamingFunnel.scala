package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming ordered-funnel progression on `transformWithState` — the
  * stateful twin of q93's batch funnel (earliest view → earliest later
  * click → earliest later purchase), correct under out-of-order arrival.
  *
  * The hard part is FINALITY: each step's time is the MINIMUM qualifying
  * event, and a late-but-legal event can lower a minimum — so a step may
  * only be emitted once the watermark has passed its candidate (any
  * future row has event time ≥ watermark, so the minimum can no longer
  * drop; same strict-< discipline as [[StreamingSessions]]). Nothing is
  * emitted from `handleInputRows`; event-time timers at the earliest
  * pending candidate drive emission, so each (user, step) is emitted
  * exactly once, with its final timestamp, even for users that never
  * receive another event.
  *
  * State is bounded by DISORDER, not stream length, via lower-bound
  * compaction: with lb(t1) = min(pending min view, watermark) a lower
  * bound on the eventual step-1 time, clicks ≤ lb(t1) can never qualify
  * (t2 must be strictly later than t1 ≥ lb(t1)) and are dropped on every
  * batch — likewise purchases against lb(t2), views compact to their
  * minimum, and a fixed step clears its stage's buffer entirely.
  *
  * The reference (`/root/reference/main.py:1-466`) has no streaming
  * constructs; this is engine-surface extension, the stateful twin of
  * q93 (SURVEY.md §2B).
  */
object StreamingFunnel {

  final case class FEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  /** A finalized funnel step: 1 = view, 2 = view>click, 3 = view>click>purchase. */
  final case class StepHit(user_id: Long, step: Int, ts_ms: Long)

  /** "Not yet final" sentinel. `Long.MinValue`, NOT -1: event-time millis
    * are legitimately negative for pre-1970 timestamps, and a step fixed
    * at a negative ts must still read as fixed (a -1 sentinel would
    * re-emit it on every later timer firing, breaking exactly-once). */
  val Unset: Long = Long.MinValue

  /** Fixed (finalized) step times; [[Unset]] = not yet final. */
  final case class Fixed(t1: Long, t2: Long, t3: Long)
  /** A pending event: kind 0 = view, 1 = click, 2 = purchase. */
  final case class Pend(tsMs: Long, kind: Int)

  val Kinds: Map[String, Int] = Map("view" -> 0, "click" -> 1, "purchase" -> 2)

  /** Pure step-fixing + compaction round: fix every step whose minimum
    * candidate is strictly below the watermark (cascading — one call can
    * fix all three), then drop pending events that can never qualify.
    * Returns (new fixed, compacted pending, emissions). Property-tested
    * in StreamingFunnelSpec against a from-scratch batch recompute. */
  def advance(fixed: Fixed, pending: Seq[Pend], wmMs: Long)
      : (Fixed, Seq[Pend], Seq[StepHit]) =
    advance(fixed, pending, wmMs, wmMs)

  /** Split-threshold variant: `fixWmMs` gates step FINALIZATION (only the
    * timer path passes a real watermark — `handleInputRows` passes -inf so
    * nothing is emitted there), while `compactWmMs` is the watermark the
    * can-never-qualify lower bounds use. Splitting them lets every input
    * batch compact state against the REAL watermark even before any step
    * is fixable — without it, a user with clicks/purchases but no view
    * would accumulate pending events unboundedly (no view candidate ⇒ no
    * fix ⇒ with a -inf compaction watermark, nothing ever dropped). */
  def advance(fixed: Fixed, pending: Seq[Pend], fixWmMs: Long, compactWmMs: Long)
      : (Fixed, Seq[Pend], Seq[StepHit]) = {
    var Fixed(t1, t2, t3) = fixed
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    def minOf(kind: Int, after: Long): Option[Long] = {
      val c = pending.iterator.filter(p => p.kind == kind && p.tsMs > after)
        .map(_.tsMs)
      if (c.isEmpty) None else Some(c.min)
    }
    var changed = true
    while (changed) {
      changed = false
      if (t1 == Unset) minOf(0, Long.MinValue) match {
        case Some(v) if v < fixWmMs => t1 = v; out += ((1, v)); changed = true
        case _ =>
      }
      if (t1 != Unset && t2 == Unset) minOf(1, t1) match {
        case Some(v) if v < fixWmMs => t2 = v; out += ((2, v)); changed = true
        case _ =>
      }
      if (t2 != Unset && t3 == Unset) minOf(2, t2) match {
        case Some(v) if v < fixWmMs => t3 = v; out += ((3, v)); changed = true
        case _ =>
      }
    }
    // lower bounds on the eventual step times: a fixed step is exact;
    // an unfixed one can end no earlier than min(best pending candidate,
    // watermark) because every future row has ts ≥ watermark
    val lb1 =
      if (t1 != Unset) t1
      else math.min(minOf(0, Long.MinValue).getOrElse(Long.MaxValue), compactWmMs)
    val lb2 =
      if (t2 != Unset) t2
      else math.max(lb1,
        math.min(minOf(1, lb1).getOrElse(Long.MaxValue), compactWmMs))
    val minView = minOf(0, Long.MinValue)
    val kept = pending.filter { p =>
      p.kind match {
        case 0 => t1 == Unset && minView.contains(p.tsMs) // only the min view can win
        case 1 => t2 == Unset && p.tsMs > lb1
        case _ => t3 == Unset && p.tsMs > lb2
      }
    }.distinct
    (Fixed(t1, t2, t3), kept, out.map { case (s, v) => StepHit(-1L, s, v) }.toSeq)
  }

  /** Earliest not-yet-final candidate = the next time a step can become
    * final; the timer target. */
  def nextCandidate(fixed: Fixed, pending: Seq[Pend]): Option[Long] = {
    def minOf(kind: Int, after: Long): Option[Long] = {
      val c = pending.iterator.filter(p => p.kind == kind && p.tsMs > after)
        .map(_.tsMs)
      if (c.isEmpty) None else Some(c.min)
    }
    if (fixed.t1 == Unset) minOf(0, Long.MinValue)
    else if (fixed.t2 == Unset) minOf(1, fixed.t1)
    else if (fixed.t3 == Unset) minOf(2, fixed.t2)
    else None
  }

  final class FunnelProcessor
      extends StatefulProcessor[Long, FEvent, StepHit] {

    @transient private var fixedState: org.apache.spark.sql.streaming.ValueState[Fixed] = _
    @transient private var pending: ListState[Pend] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      fixedState = getHandle.getValueState[Fixed](
        "fixed", Encoders.product[Fixed], TTLConfig.NONE)
      pending = getHandle.getListState[Pend](
        "pending", Encoders.product[Pend], TTLConfig.NONE)
    }

    private def loadFixed(): Fixed =
      if (fixedState.exists()) fixedState.get() else Fixed(Unset, Unset, Unset)

    private def clearTimers(): Unit = {
      val timers = {
        val it = getHandle.listTimers()
        val b = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (it.hasNext) b += it.next().asInstanceOf[Long]
        b
      }
      timers.foreach(getHandle.deleteTimer)
    }

    private def park(fixed: Fixed, pend: Seq[Pend], wmMs: Long): Unit = {
      fixedState.update(fixed)
      if (pend.isEmpty) pending.clear() else pending.put(pend.toArray)
      clearTimers()
      nextCandidate(fixed, pend) match {
        case Some(t) => getHandle.registerTimer(t)
        case None =>
          // no fixable candidate but state remains (e.g. clicks with no
          // view yet): a cleanup timer just past the current watermark
          // guarantees compaction keeps running for keys that never see
          // another input row — without it their pending buffer would
          // outlive the disorder bound
          if (pend.nonEmpty) getHandle.registerTimer(wmMs + 1)
      }
    }

    override def handleInputRows(
        user: Long,
        rows: Iterator[FEvent],
        timerValues: TimerValues): Iterator[StepHit] = {
      val existing = if (pending.exists()) pending.get().toSeq else Seq.empty
      val fresh = rows.flatMap(e =>
        Kinds.get(e.event_type).map(k => Pend(e.ts.getTime, k))).toSeq
      // compact against the current watermark but do NOT emit here —
      // emission is the watermark's job (finality), exactly as in
      // StreamingSessions; steps that became fixable are re-detected by
      // the (possibly past) timer on the next watermark advance
      val wm = timerValues.getCurrentWatermarkInMs
      val fixed = loadFixed()
      val (_, kept0, _) = advance(fixed, existing ++ fresh,
        Long.MinValue, // fix threshold -inf: nothing emits here
        wm)            // but compaction sees the REAL watermark
      park(fixed, kept0, wm)
      Iterator.empty
    }

    override def handleExpiredTimer(
        user: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[StepHit] = {
      val wm = timerValues.getCurrentWatermarkInMs
      val existing = if (pending.exists()) pending.get().toSeq else Seq.empty
      val (fixed, kept, hits) = advance(loadFixed(), existing, wm)
      park(fixed, kept, wm)
      hits.iterator.map(h => StepHit(user, h.step, h.ts_ms))
    }
  }

  /** Append-mode finalized funnel steps; `events` must carry a watermark
    * on `ts`. */
  def steps(events: Dataset[FEvent]): Dataset[StepHit] = {
    implicit val outEnc = Encoders.product[StepHit]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new FunnelProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}
