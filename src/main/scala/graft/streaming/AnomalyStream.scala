package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One per-key daily (or per-window) observation count. */
case class KeyedCount(key: String, day: String, n: Long)

/** Emitted when a key's volume drifts off its own trailing baseline. */
case class VolumeAnomaly(key: String, day: String, n: Long,
    baseline: Double, ratio: Double)

/** G9 `AnomalyStream` — streaming volume-drift detector: the streaming
  * form of `events_anomaly` (B31). Keeps each key's trailing window of
  * daily counts in `GroupState` (bounded ring of [[Trail]] doubles) and
  * emits an anomaly when a day's count leaves the
  * [1/[[MaxRatio]], [[MaxRatio]]] band around the trailing mean — the
  * pipeline-health alarm (collapsed scrape, upstream flood) that
  * cannot wait for the batch job.
  *
  * State is O(keys × [[Trail]]) — independent of event volume; the
  * upstream windowed count aggregation (see `stream_window_counts`)
  * bounds what reaches this operator to one row per key per window.
  * Same rule, same constants as the batch operator, so batch and
  * stream agree on what "anomalous" means.
  */
object AnomalyStream {

  val Trail = 7        // trailing window length (days)
  val MinBaseline = 3  // don't alarm until this many history points
  val MaxRatio = 2.0   // alarm outside [baseline/2, baseline*2]

  def anomalies(ds: Dataset[KeyedCount]): Dataset[VolumeAnomaly] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[List[Double], VolumeAnomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(detect)
  }

  private def detect(key: String, rows: Iterator[KeyedCount],
      state: GroupState[List[Double]]): Iterator[VolumeAnomaly] = {
    val sorted = rows.toSeq.sortBy(_.day)
    val out = Seq.newBuilder[VolumeAnomaly]
    var hist = state.getOption.getOrElse(Nil) // most recent first
    sorted.foreach { r =>
      if (hist.size >= MinBaseline) {
        val base = hist.sum / hist.size
        if (base == 0) {
          // all-zero history: any nonzero count is an anomaly, but the
          // ratio is undefined — emit the documented sentinel (-1.0)
          // instead of letting n/0 push Infinity/NaN downstream
          if (r.n > 0)
            out += VolumeAnomaly(key, r.day, r.n, 0.0, -1.0)
        } else {
          val ratio = r.n / base
          if (ratio > MaxRatio || ratio < 1.0 / MaxRatio)
            out += VolumeAnomaly(key, r.day, r.n,
              math.round(base * 10000).toDouble / 10000,
              math.round(ratio * 10000).toDouble / 10000)
        }
      }
      hist = (r.n.toDouble :: hist).take(Trail)
    }
    state.update(hist)
    out.result().iterator
  }
}
