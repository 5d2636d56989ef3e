package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

import scala.collection.mutable.ArrayBuffer

/** Timer-based streaming sessionization on `transformWithState` — the
  * EVENT-TIME-TIMER form of q16's gap sessionization: a session closes
  * when the WATERMARK passes `last_event + gap`, not when the next event
  * for the key happens to arrive. The built-in `session_window`
  * aggregation emits merged windows but hides expiry; an explicit
  * `registerTimer(lastMs + gap)` + `handleExpiredTimer` is the API that
  * lets a 100 TB pipeline hold per-key session state (one small struct)
  * and flush it deterministically as event time advances — including for
  * keys that NEVER receive another event (the case per-key gap logic
  * alone cannot close).
  *
  * In-batch gaps split sessions immediately (emitted inline); the
  * trailing open session parks in a ValueState with one pending timer
  * (re-registered as events extend the session). State per key is one
  * (start, last, n) struct + one timer at any moment.
  *
  * The reference (`/root/reference/main.py:1-466`) has no streaming
  * constructs (SURVEY.md §1.1); this is engine-surface extension, the
  * timer-API twin of q16's batch gap sessionization.
  */
object StreamingSessions {

  final case class SEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)
  final case class SessState(startMs: Long, lastMs: Long, n: Long)

  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SEvent, Session] {

    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[SessState](
        "session", Encoders.product[SessState], TTLConfig.NONE)
    }

    private def clearTimers(): Unit = {
      val it = getHandle.listTimers()
      while (it.hasNext) {
        getHandle.deleteTimer(it.next().asInstanceOf[Long])
      }
    }

    override def handleInputRows(
        user: Long,
        rows: Iterator[SEvent],
        timerValues: TimerValues): Iterator[Session] = {
      // Interval sweep over {parked session} ∪ {batch events}: late events
      // (older than the parked session, legal up to the watermark delay)
      // extend the session BACKWARD when within the gap, or form their own
      // earlier session when disjoint — a cross-batch out-of-order event
      // must never silently inflate the parked session's count (it would
      // corrupt both bounds and splits).
      val evs = rows.map(_.ts.getTime).toArray
      java.util.Arrays.sort(evs)
      var ivs = evs.map(t => SessState(t, t, 1L))
      if (state.exists()) {
        val st = state.get()
        val at = ivs.indexWhere(_.startMs > st.startMs) match {
          case -1 => ivs.length
          case i => i
        }
        ivs = (ivs.take(at) :+ st) ++ ivs.drop(at)
      }
      val closed = ArrayBuffer.empty[Session]
      var cur: SessState = null
      ivs.foreach { iv =>
        if (cur == null) cur = iv
        else if (iv.startMs - cur.lastMs > gapMs) {
          closed += Session(user, cur.startMs, cur.lastMs, cur.n)
          cur = iv
        } else cur = SessState(cur.startMs,
          math.max(cur.lastMs, iv.lastMs), cur.n + iv.n)
      }
      if (cur != null) {
        state.update(cur)
        clearTimers()
        getHandle.registerTimer(cur.lastMs + gapMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(
        user: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      if (state.exists()) {
        val st = state.get()
        // a stale timer (already superseded by a re-registration) must not
        // flush a still-open session
        if (st.lastMs + gapMs <= expiredTimerInfo.getExpiryTimeInMs) {
          state.clear()
          Iterator.single(Session(user, st.startMs, st.lastMs, st.n))
        } else Iterator.empty
      } else Iterator.empty
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
