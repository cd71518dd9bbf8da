package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.etl.AlertSink

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

  /** Delivery tail for the alert stream: each non-empty micro-batch
    * becomes ONE digest through an [[AlertSink]] (the streaming
    * counterpart of DailyPipeline step 6 — same renderer, same sinks,
    * so batch and stream alerts look identical to the recipient).
    * `foreachBatch` runs driver-side on delta-sized frames by
    * construction (only new/changed keys reach it); bodies cap at
    * [[AlertSink.MaxCards]] cards with the true count in the subject.
    * Caller owns checkpoint/trigger and `.start()`.
    */
  def deliver(alerts: Dataset[DeltaAlert],
      sink: AlertSink): DataStreamWriter[DeltaAlert] =
    alerts.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[DeltaAlert], batchId: Long) =>
        val n = batch.count()
        if (n > 0) sink.send(
          s"ALERT: $n delta(s) in batch $batchId",
          AlertSink.renderCards(batch.orderBy("key", "kind")
            .limit(AlertSink.MaxCards).toDF()))
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
