package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One typed event in a user's activity stream. */
case class SeqEvent(user_id: Long, ts: Timestamp, event_id: Long,
    event_type: String)

/** An emitted pattern instance (one row per matching purchase). */
case class SeqMatch(user_id: Long, view_ts: Timestamp, click_ts: Timestamp,
    purchase_ts: Timestamp, span_sec: Long)

/** G18 `SequenceMatchStream` — streaming CEP: the live arm of B96's
  * ordered-pattern detector (view → click → purchase, span ≤ 72 h, no
  * `error` inside the span, skip-till-next-match). The batch operator
  * computes the carries with window functions; here they ARE the
  * state: per user exactly four timestamps (last view, the anchored
  * (view, click) pair, last error) — O(1) state per key, nothing
  * buffered, which is what makes this pattern class streamable where
  * a backtracking regex over the event history is not. A purchase is
  * evaluated against the carries THE MOMENT IT ARRIVES, so matches
  * emit in append mode with no retraction and no watermark hold: the
  * stream emits exactly the rows of the batch arm's instance frame
  * ([[graft.operators.EventOps.sequenceMatchInstances]]).
  *
  * Ordering contract: the carries are a left fold over each user's
  * event sequence, so output is INVARIANT under any micro-batch
  * split of an in-order stream (spec-pinned: 1-batch ≡ 3-batch ≡
  * batch arm) — the per-user in-order delivery a key-partitioned log
  * (Kafka partition per user-key hash) guarantees. Out-of-order
  * arrivals WITHIN a micro-batch are repaired by the per-batch
  * (ts, event_id) sort; arrivals out of order ACROSS batches follow
  * the monotonic-contract rule the other G-section detectors use
  * (G16's late-day drop): a carry never moves backwards in time.
  */
object SequenceMatchStream {

  def matches(ds: Dataset[SeqEvent]): Dataset[SeqMatch] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, SeqMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** The four carries. Micros, not Timestamp, so the state encoder is
    * flat primitives (Long.MinValue = unset) and comparisons are the
    * exact integer arithmetic of the batch arm.
    */
  case class SeqState(lv: Long, pv: Long, pc: Long, le: Long)

  private val Unset = Long.MinValue

  private[streaming] def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def step(userId: Long, rows: Iterator[SeqEvent],
      state: GroupState[SeqState]): Iterator[SeqMatch] = {
    var s = state.getOption.getOrElse(SeqState(Unset, Unset, Unset, Unset))
    val out = Seq.newBuilder[SeqMatch]
    rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val us = micros(e.ts)
      e.event_type match {
        // >= so a same-microsecond later-event_id update overwrites,
        // exactly as the batch fold's (ts, event_id) order does, while
        // a cross-batch LATE arrival still can't move a carry backward
        case "view" => if (us >= s.lv) s = s.copy(lv = us)
        case "error" => if (us >= s.le) s = s.copy(le = us)
        case "click" =>
          if (s.lv != Unset && us >= s.pc) s = s.copy(pv = s.lv, pc = us)
        case "purchase" =>
          if (s.pc != Unset &&
              us - s.pv <= graft.operators.EventOps.SeqMatchWindowUs &&
              (s.le == Unset || s.le < s.pv))
            out += SeqMatch(userId, fromMicros(s.pv), fromMicros(s.pc),
              e.ts, (us - s.pv) / 1000000L)
        case _ => ()
      }
    }
    state.update(s)
    out.result().iterator
  }
}
