package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Timer-based streaming sessionization on `transformWithState` — the
  * EVENT-TIME-TIMER form of q16's gap sessionization: a session closes
  * when the WATERMARK passes `last_event + gap`, not when the next event
  * for the key happens to arrive. The built-in `session_window`
  * aggregation emits merged windows but hides expiry; explicit timers +
  * `handleExpiredTimer` are the API that lets a 100 TB pipeline hold
  * per-key session state and flush it deterministically as event time
  * advances — including for keys that NEVER receive another event (the
  * case per-key gap logic alone cannot close).
  *
  * Correctness under disorder: NOTHING is emitted from `handleInputRows`.
  * Every gap-separated interval parks in a ListState until the watermark
  * passes its `last + gap` — only then is a bridging event impossible
  * (such an event would have `t ≤ last + gap < watermark` and be dropped
  * as late before reaching the processor), so emission is final by
  * construction. Late-but-legal events (within the watermark delay)
  * extend parked intervals backward, merge them, or form new earlier
  * intervals via one interval sweep per batch. State per key is the
  * pending-interval list (bounded by disorder, not stream length) and
  * ONE timer at the earliest pending close.
  *
  * The reference (`/root/reference/main.py:1-466`) has no streaming
  * constructs (SURVEY.md §1.1); this is engine-surface extension, the
  * timer-API twin of q16's batch gap sessionization.
  */
object StreamingSessions {

  final case class SEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)
  final case class SessState(startMs: Long, lastMs: Long, n: Long)

  /** Merge gap-connected intervals; input ANY order, output sorted by
    * start, pairwise gap-disjoint. Pure — property-tested in
    * StreamingSessionsSpec against single-pass sessionization. */
  def sweep(ivs: Seq[SessState], gapMs: Long): Seq[SessState] = {
    val sorted = ivs.sortBy(iv => (iv.startMs, iv.lastMs))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessState]
    sorted.foreach { iv =>
      if (out.nonEmpty && iv.startMs - out.last.lastMs <= gapMs) {
        val cur = out.remove(out.length - 1)
        out += SessState(cur.startMs,
          math.max(cur.lastMs, iv.lastMs), cur.n + iv.n)
      } else out += iv
    }
    out.toSeq
  }

  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SEvent, Session] {

    @transient private var pending: ListState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[SessState](
        "pending", Encoders.product[SessState], TTLConfig.NONE)
    }

    private def clearTimers(): Unit = {
      // materialize before deleting: the timer iterator is state-store
      // backed, and mutation during iteration is not a safe contract
      val timers = {
        val it = getHandle.listTimers()
        val b = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (it.hasNext) b += it.next().asInstanceOf[Long]
        b
      }
      timers.foreach(getHandle.deleteTimer)
    }

    private def park(ivs: Seq[SessState]): Unit = {
      if (ivs.isEmpty) pending.clear()
      else pending.put(ivs.toArray)
      clearTimers()
      // one timer at the earliest pending close (intervals are sorted and
      // gap-disjoint, so the first interval closes first)
      ivs.headOption.foreach(iv => getHandle.registerTimer(iv.lastMs + gapMs))
    }

    override def handleInputRows(
        user: Long,
        rows: Iterator[SEvent],
        timerValues: TimerValues): Iterator[Session] = {
      val existing =
        if (pending.exists()) pending.get().toSeq else Seq.empty
      val fresh = rows.map(e => SessState(e.ts.getTime, e.ts.getTime, 1L)).toSeq
      park(sweep(existing ++ fresh, gapMs))
      Iterator.empty // emission is the watermark's job, never the batch's
    }

    override def handleExpiredTimer(
        user: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      val wm = math.max(
        timerValues.getCurrentWatermarkInMs,
        expiredTimerInfo.getExpiryTimeInMs)
      val ivs = if (pending.exists()) pending.get().toSeq else Seq.empty
      // STRICT <: Spark admits rows with event time == watermark, so a
      // bridging event at exactly last + gap == wm could still arrive.
      // Such an interval stays parked; its re-registered (past) timer
      // re-fires on the next watermark advance.
      val (close, keep) = ivs.partition(_.lastMs + gapMs < wm)
      park(keep)
      close.iterator.map(iv => Session(user, iv.startMs, iv.lastMs, iv.n))
    }
  }

  /** Append-mode closed sessions; `events` must carry a watermark on `ts`. */
  def sessions(events: Dataset[SEvent], gapMs: Long): Dataset[Session] = {
    require(gapMs > 0, s"session gap must be positive, got $gapMs")
    implicit val outEnc = Encoders.product[Session]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
