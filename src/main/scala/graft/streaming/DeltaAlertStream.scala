package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation of a keyed value (e.g. one scraped card). */
case class KeyedValue(key: String, value: Double, ts: Timestamp)

/** Emitted when a key first appears or its value changes. */
case class DeltaAlert(key: String, kind: String, old_value: Double,
    new_value: Double)

/** G3 `DeltaAlertStream` — stateful new/changed-key detector: the
  * streaming generalization of the reference's daily snapshot diff +
  * conditional notification (aiesec.py:142-144,241-251). Keeps the last
  * seen value per key in `GroupState`; emits `new` on first sight and
  * `changed` on value drift, nothing otherwise — so downstream sinks
  * (the alert channel) only ever see deltas.
  *
  * State is partitioned by key across executors; per-key state is one
  * double, so state store size is O(distinct keys), not O(events).
  */
object DeltaAlertStream {

  def alerts(ds: Dataset[KeyedValue]): Dataset[DeltaAlert] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Double, DeltaAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(detect)
  }

  private def detect(key: String, rows: Iterator[KeyedValue],
      state: GroupState[Double]): Iterator[DeltaAlert] = {
    val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.value))
    val out = Seq.newBuilder[DeltaAlert]
    var last: Option[Double] = state.getOption
    sorted.foreach { r =>
      last match {
        case None =>
          out += DeltaAlert(key, "new", Double.NaN, r.value)
        case Some(prev) if prev != r.value =>
          out += DeltaAlert(key, "changed", prev, r.value)
        case _ => ()
      }
      last = Some(r.value)
    }
    last.foreach(state.update)
    out.result().iterator
  }
}
