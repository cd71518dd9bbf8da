package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

/** One incoming document on the intake stream. */
case class StreamDoc(doc_id: Long, text: String)

/** One sliding-window occurrence: window hash + where it sits. */
case class WinOcc(wh: Long, doc_id: Long, pos: Int)

/** A duplicate-span witness: this occurrence repeats a window first
  * claimed at (first_doc, first_pos).
  */
case class WinDup(wh: Long, doc_id: Long, pos: Int,
    first_doc: Long, first_pos: Int)

/** A timestamped intake document (the TTL arm's input). */
case class TsDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** Timestamped window occurrence. */
case class WinOccT(wh: Long, doc_id: Long, pos: Int,
    ts: java.sql.Timestamp)

/** G15 `SubstringDedupStream` — the streaming twin of D12
  * `dedup_substring`: CONTINUOUS exact-substring dedup at corpus
  * intake (the CCNet-shape "check new documents against everything
  * already admitted" gate, where the batch D12 is the
  * bootstrap/backfill pass). Every arriving document explodes into
  * its sliding [[graft.dedup.Dedup.SubTokens]]-token window hashes
  * through the same H14 rolling kernel; state lives per window hash
  * and holds ONE claim — the first (doc_id, pos) ever seen. Later
  * occurrences anywhere in the stream emit a [[WinDup]] witness
  * naming the claim they repeat, which is exactly the keep-first rule
  * the batch operators apply as min((doc_id, pos)) per group — so
  * when documents arrive in doc_id order, stream output ≡ the batch
  * keep-first dup set regardless of how the stream is micro-batched
  * (spec-pinned: 1-batch and 3-batch replays produce the identical
  * witness set, equal to a batch replay of D12's window groups).
  *
  * Within a micro-batch, occurrences of one window process in
  * (doc_id, pos) order — the batch tiebreak — so claim assignment is
  * deterministic, not arrival-racy. State is one 16-byte claim per
  * DISTINCT window in the admitted corpus, hash-partitioned across
  * executors (the same O(distinct windows) a batch dedup shuffles;
  * production bounds it with state-store TTL exactly as CCNet ages
  * out its hash shards).
  */
object SubstringDedupStream {

  val W: Int = graft.dedup.Dedup.SubTokens

  /** The per-hash claim: first place this window was seen. */
  case class WinClaim(first_doc: Long, first_pos: Int)

  /** Explode an intake stream into window occurrences — the same
    * H14 kernel the batch operator compiles into codegen.
    */
  def occurrences(docs: Dataset[StreamDoc]): Dataset[WinOcc] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      val hs = graft.functions.VecOps.rollingWinHashes(
        UTF8String.fromString(d.text), W)
      (0 until hs.numElements()).map(i => WinOcc(hs.getLong(i), d.doc_id, i))
    }
  }

  /** Duplicate witnesses, continuously. */
  def dups(occ: Dataset[WinOcc]): Dataset[WinDup] = {
    import occ.sparkSession.implicits._
    occ.groupByKey(_.wh)
      .flatMapGroupsWithState[WinClaim, WinDup](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(apply)
  }

  def pipeline(docs: Dataset[StreamDoc]): Dataset[WinDup] =
    dups(occurrences(docs))

  private def apply(wh: Long, rows: Iterator[WinOcc],
      state: GroupState[WinClaim]): Iterator[WinDup] = {
    // batch tiebreak: occurrences within the micro-batch claim in
    // (doc_id, pos) order, so output never depends on task order
    val sorted = rows.toSeq.sortBy(o => (o.doc_id, o.pos))
    var claim = state.getOption
    val out = Seq.newBuilder[WinDup]
    sorted.foreach { o =>
      claim match {
        case None =>
          claim = Some(WinClaim(o.doc_id, o.pos))
        case Some(c) =>
          out += WinDup(wh, o.doc_id, o.pos, c.first_doc, c.first_pos)
      }
    }
    claim.foreach(state.update)
    out.result().iterator
  }

  // ------------------------------------------------------- TTL arm

  /** How long a window claim outlives its last sighting. */
  val ClaimTtl = "10 minutes"
  private val ClaimTtlMs = 10L * 60 * 1000

  /** The bounded-state arm: claims AGE OUT [[ClaimTtl]] of EVENT time
    * after their last sighting (every re-occurrence refreshes the
    * clock), exactly how a production CCNet-style intake ages its
    * hash shards so state tracks the live dedup horizon instead of
    * the full corpus history. Event-time timeouts (not processing
    * time) keep expiry DETERMINISTIC on a replayed log — the spec
    * replays the same batches and gets the same expiries. After a
    * claim expires, the next occurrence re-claims and is NOT a dup:
    * the horizon is the contract, matching a batch dedup run over
    * only the trailing window of the corpus.
    */
  def pipelineTtl(docs: Dataset[TsDoc]): Dataset[WinDup] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap { d =>
        val hs = graft.functions.VecOps.rollingWinHashes(
          UTF8String.fromString(d.text), W)
        (0 until hs.numElements()).map(i =>
          WinOccT(hs.getLong(i), d.doc_id, i, d.ts))
      }
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.wh)
      .flatMapGroupsWithState[WinClaim, WinDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(applyTtl)
  }

  private def applyTtl(wh: Long, rows: Iterator[WinOccT],
      state: GroupState[WinClaim]): Iterator[WinDup] = {
    if (state.hasTimedOut) {
      state.remove() // claim aged out; next sighting re-claims
      return Iterator.empty
    }
    val sorted = rows.toSeq.sortBy(o => (o.doc_id, o.pos))
    var claim = state.getOption
    val out = Seq.newBuilder[WinDup]
    sorted.foreach { o =>
      claim match {
        case None =>
          claim = Some(WinClaim(o.doc_id, o.pos))
        case Some(c) =>
          out += WinDup(wh, o.doc_id, o.pos, c.first_doc, c.first_pos)
      }
    }
    claim.foreach { c =>
      state.update(c)
      val lastSeen = sorted.map(_.ts.getTime).max
      state.setTimeoutTimestamp(lastSeen + ClaimTtlMs)
    }
    out.result().iterator
  }
}
