package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event in a user's activity stream. */
case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Per-session state / output: [start, end] bounds, counts, value sum. */
case class SessionAgg(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, session_value: Double)

/** G4 `SessionizeStream` — streaming time-gap sessionization: the
  * continuous counterpart of the batch `sessionize` operator (B16,
  * same 30-minute gap rule). State per user is ONE open session
  * (bounds + aggregates, constant size); a session closes either when
  * a later event arrives past the gap, or when the event-time
  * watermark passes `session_end + gap` (EventTimeTimeout) — so
  * sessions are emitted exactly once, in append mode, without holding
  * events.
  */
object SessionizeStream {

  val GapMs: Long = 30L * 60 * 1000
  val WatermarkDelay = "10 minutes"

  def sessions(ds: Dataset[SessionEvent]): Dataset[SessionAgg] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, SessionAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(detect)
  }

  private def detect(userId: Long, rows: Iterator[SessionEvent],
      state: GroupState[SessionAgg]): Iterator[SessionAgg] = {
    if (state.hasTimedOut) {
      // watermark passed the open session's close horizon → flush it
      val out = state.get
      state.remove()
      return Iterator(out)
    }
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
    val closed = Seq.newBuilder[SessionAgg]
    var open: Option[SessionAgg] = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        // Only a POSITIVE gap past session_end opens a new session; a
        // late (out-of-order, within-watermark) event must extend the
        // open session's bounds with min/max, never move them backwards.
        case Some(s) if t > s.session_end.getTime + GapMs =>
          closed += s
          open = Some(SessionAgg(userId, e.ts, e.ts, 1, e.value))
        case Some(s) if t < s.session_start.getTime - GapMs =>
          // late event more than a gap BEFORE the open session: by the
          // batch gap rule it is its own (already-closed) session
          closed += SessionAgg(userId, e.ts, e.ts, 1, e.value)
        case Some(s) =>
          open = Some(s.copy(
            session_start = if (t < s.session_start.getTime) e.ts else s.session_start,
            session_end = if (t > s.session_end.getTime) e.ts else s.session_end,
            n_events = s.n_events + 1,
            session_value = s.session_value + e.value))
        case None =>
          open = Some(SessionAgg(userId, e.ts, e.ts, 1, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.session_end.getTime + GapMs)
    }
    closed.result().iterator
  }
}
