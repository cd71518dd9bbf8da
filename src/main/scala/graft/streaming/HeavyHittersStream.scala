package graft.streaming

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MisraGries

/** One observed item for a key's live frequency tracking. */
case class TokenObs(key: String, tok: String)

/** The refreshed per-key frequent-items view after a batch folds in:
  * exact total observation count plus the live Misra-Gries counters
  * (a GUARANTEED superset of every item with frequency > n/(k+1),
  * counts underestimating by at most n/(k+1)).
  */
case class HeavyUpdate(key: String, n: Long, candidates: Map[String, Long])

/** G19 `HeavyHittersStream` — streaming frequent-items maintenance:
  * the live arm of H9, completing the sketch-maintenance family (G10
  * keeps HLL distinct-count state, G14 keeps KLL value-distribution
  * state; this keeps the Misra-Gries frequent-items state). Each key
  * holds ONE serialized MG buffer plus its exact fold count in
  * `GroupState` — the state store speaks the aggregate's exact wire
  * format ([[MisraGries.toBytes]]/[[MisraGries.fromBytes]]) and every
  * arriving item folds through the SAME [[MisraGries.fold]] the batch
  * aggregate runs, so batch partial exchange and stream state are one
  * code path. After each batch the key emits its refreshed candidate
  * counters + exact total: the live "what's trending" feed that
  * would otherwise need a full re-group of history per refresh.
  *
  * State is O(keys × capacity) — KBs per key at ANY volume. The MG
  * superset guarantee is split-invariant: a sequential fold over the
  * concatenated stream IS the classic single-machine Misra-Gries, so
  * any item with true frequency > n/(capacity+1) survives in state
  * regardless of how batches chop the stream, and every surviving
  * count underestimates by at most n/(capacity+1) (the spec pins
  * both under 1- and 3-batch splits, plus a bitwise single-sequence
  * replay against a local fold — the stream ≡ batch-superset
  * contract; the registered batch arm `stream_heavy_hitters` replays
  * C11's sketch-then-verify exactly per group under the DuckDB gate).
  */
object HeavyHittersStream {

  val Capacity = 512 // matches the batch arm (TextOps.MgCapacity)

  def heavyHitters(ds: Dataset[TokenObs],
      capacity: Int = Capacity): Dataset[HeavyUpdate] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Array[Byte], HeavyUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step(capacity))
  }

  private def step(capacity: Int)(key: String, rows: Iterator[TokenObs],
      state: GroupState[Array[Byte]]): Iterator[HeavyUpdate] = {
    val (n0, sketch) = state.getOption.map(decode)
      .getOrElse((0L, mutable.HashMap.empty[String, Long]))
    var n = n0
    rows.foreach { r =>
      MisraGries.fold(sketch, r.tok, capacity)
      n += 1
    }
    if (n == n0) Iterator.empty
    else {
      state.update(encode(n, sketch))
      Iterator.single(HeavyUpdate(key, n, sketch.toMap))
    }
  }

  // state wire format: 8-byte fold count, then the H9 aggregate's
  // exact buffer bytes
  private def encode(n: Long, m: mutable.HashMap[String, Long]): Array[Byte] = {
    val body = MisraGries.toBytes(m)
    ByteBuffer.allocate(8 + body.length).putLong(n).put(body).array()
  }

  private def decode(b: Array[Byte]): (Long, mutable.HashMap[String, Long]) = {
    val bb = ByteBuffer.wrap(b)
    val n = bb.getLong()
    val body = new Array[Byte](b.length - 8)
    bb.get(body)
    (n, MisraGries.fromBytes(body))
  }
}
