package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One CDC record: op 'D' deletes the key, anything else upserts. */
case class CdcRecord(key: Long, ts: Timestamp, event_id: Long, op: String,
    new_value: Double)

/** Current materialized row for a key, or its tombstone. */
case class CdcState(key: Long, op: String, ts: Timestamp, event_id: Long,
    value: Double, n_applied: Long)

/** G13 `MergeCdcStream` — the streaming twin of A35 `etl_merge_cdc`:
  * MERGE INTO semantics applied CONTINUOUSLY from a change stream.
  * State per key is one (latest-op, value) row — constant size, the
  * same last-op-wins rule as the batch operator ((ts, event_id) order,
  * so replays and out-of-order deliveries within the watermark
  * converge to the identical merge the batch window computes). Every
  * micro-batch emits the keys it changed (update mode semantics via
  * flatMapGroups output); deletes emit a tombstone row (`op = "D"`)
  * so a downstream sink can propagate the removal — the detail a
  * naive streaming upsert silently loses.
  *
  * At scale this is the standard Kafka→lakehouse merge shape: state is
  * O(live keys) across the cluster, partitioned by key hash; the batch
  * A35 operator is the backfill/bootstrap path over the same decision
  * matrix, and the spec pins stream ≡ batch on a replayed log.
  */
object MergeCdcStream {

  val WatermarkDelay = "10 minutes"

  def merged(ds: Dataset[CdcRecord]): Dataset[CdcState] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", WatermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, CdcState](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(apply)
  }

  /** Newer iff strictly later in ((ts, event_id)) order — the batch
    * operator's exact tiebreak.
    */
  private def newer(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)

  private def apply(key: Long, rows: Iterator[CdcRecord],
      state: GroupState[CdcState]): Iterator[CdcState] = {
    var cur = state.getOption
    val before = cur.map(s => (s.ts.getTime, s.event_id))
    var applied = cur.map(_.n_applied).getOrElse(0L)
    rows.foreach { r =>
      applied += 1
      val stamp = (r.ts.getTime, r.event_id)
      val curStamp = cur.map(s => (s.ts.getTime, s.event_id))
      if (curStamp.isEmpty || newer(stamp, curStamp.get))
        cur = Some(CdcState(key, if (r.op == "D") "D" else "U",
          r.ts, r.event_id, r.new_value, applied))
      else
        cur = cur.map(s => s.copy(n_applied = applied))
    }
    val after = cur.map(s => (s.ts.getTime, s.event_id))
    cur match {
      case Some(s) =>
        state.update(s)
        // emit only when the winning (op, stamp) actually moved — a
        // batch of stale replays changes nothing downstream
        if (before != after) Iterator(s) else Iterator.empty
      case None => Iterator.empty
    }
  }
}
