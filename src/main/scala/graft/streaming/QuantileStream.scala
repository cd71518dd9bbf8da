package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.QuantileSketch

/** One observed value for a key's live distribution. */
case class ValueObs(key: String, value: Double)

/** The refreshed per-key distribution summary after a batch folds in. */
case class QuantileUpdate(key: String, n: Long,
    p50: Double, p95: Double, p99: Double)

/** G14 `QuantileStream` — streaming quantile-sketch maintenance: the
  * live arm of H12, completing the sketch-maintenance pair (G10 keeps
  * HLL distinct-count state; this keeps the KLL value-distribution
  * state). Each key holds ONE serialized H12 sketch in `GroupState` —
  * the state store speaks the aggregate's exact wire format
  * ([[QuantileSketch.toBytes]]/[[QuantileSketch.fromBytes]], one code
  * path for the batch partial exchange and the stream state) — and
  * every arriving value folds through the same `insert` the batch
  * aggregate runs. After each batch the key emits its refreshed
  * p50/p95/p99 + exact observation count: the live "is latency
  * drifting" feed that would otherwise need a full re-sort of history
  * per refresh.
  *
  * State is O(keys × k log(n/k)) — KBs per key at any volume, the same
  * bound the spec pins for the batch aggregate. Weight (the exact
  * count of folded observations) conserves across any batch split of
  * the input: insertion order affects which SAMPLES survive
  * compaction (KLL is merge-order dependent — why H12 is spec-only,
  * no cross-engine replay), but never the count, and the rank-error
  * bound holds under any batching; the spec pins count conservation,
  * a single-sequence replay equality against a local fold, and the
  * error bound across batch splits.
  */
object QuantileStream {

  val Capacity = 200 // sketch compaction capacity (matches H12 spec)

  def quantiles(ds: Dataset[ValueObs]): Dataset[QuantileUpdate] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Array[Byte], QuantileUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  private def step(key: String, rows: Iterator[ValueObs],
      state: GroupState[Array[Byte]]): Iterator[QuantileUpdate] = {
    val sketch = state.getOption
      .map(QuantileSketch.fromBytes)
      .getOrElse(new QuantileSketch.Levels)
    var any = false
    rows.foreach { r =>
      sketch.insert(r.value, Capacity)
      any = true
    }
    if (!any) Iterator.empty
    else {
      state.update(QuantileSketch.toBytes(sketch))
      Iterator.single(QuantileUpdate(key, sketch.totalWeight,
        sketch.quantile(0.5), sketch.quantile(0.95), sketch.quantile(0.99)))
    }
  }
}
