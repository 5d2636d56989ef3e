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
  /** Fixed (finalized) step times; -1 = not yet final. */
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
      if (t1 < 0) minOf(0, Long.MinValue) match {
        case Some(v) if v < wmMs => t1 = v; out += ((1, v)); changed = true
        case _ =>
      }
      if (t1 >= 0 && t2 < 0) minOf(1, t1) match {
        case Some(v) if v < wmMs => t2 = v; out += ((2, v)); changed = true
        case _ =>
      }
      if (t2 >= 0 && t3 < 0) minOf(2, t2) match {
        case Some(v) if v < wmMs => t3 = v; out += ((3, v)); changed = true
        case _ =>
      }
    }
    // lower bounds on the eventual step times: a fixed step is exact;
    // an unfixed one can end no earlier than min(best pending candidate,
    // watermark) because every future row has ts ≥ watermark
    val lb1 =
      if (t1 >= 0) t1
      else math.min(minOf(0, Long.MinValue).getOrElse(Long.MaxValue), wmMs)
    val lb2 =
      if (t2 >= 0) t2
      else math.max(lb1, math.min(minOf(1, lb1).getOrElse(Long.MaxValue), wmMs))
    val minView = minOf(0, Long.MinValue)
    val kept = pending.filter { p =>
      p.kind match {
        case 0 => t1 < 0 && minView.contains(p.tsMs) // only the min view can win
        case 1 => t2 < 0 && p.tsMs > lb1
        case _ => t3 < 0 && p.tsMs > lb2
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
    if (fixed.t1 < 0) minOf(0, Long.MinValue)
    else if (fixed.t2 < 0) minOf(1, fixed.t1)
    else if (fixed.t3 < 0) minOf(2, fixed.t2)
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
      if (fixedState.exists()) fixedState.get() else Fixed(-1L, -1L, -1L)

    private def clearTimers(): Unit = {
      val timers = {
        val it = getHandle.listTimers()
        val b = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (it.hasNext) b += it.next().asInstanceOf[Long]
        b
      }
      timers.foreach(getHandle.deleteTimer)
    }

    private def park(fixed: Fixed, pend: Seq[Pend]): Unit = {
      fixedState.update(fixed)
      if (pend.isEmpty) pending.clear() else pending.put(pend.toArray)
      clearTimers()
      nextCandidate(fixed, pend).foreach(getHandle.registerTimer)
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
      val fixed = loadFixed()
      val (_, kept0, _) = advance(fixed, existing ++ fresh,
        Long.MinValue) // compaction only: nothing fixes below -inf wm
      park(fixed, kept0)
      Iterator.empty
    }

    override def handleExpiredTimer(
        user: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[StepHit] = {
      val wm = timerValues.getCurrentWatermarkInMs
      val existing = if (pending.exists()) pending.get().toSeq else Seq.empty
      val (fixed, kept, hits) = advance(loadFixed(), existing, wm)
      park(fixed, kept)
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
