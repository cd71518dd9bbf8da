package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One incoming embedding on the intake stream. */
case class StreamVec(vec_id: Long, embedding: Array[Float])

/** A semantic-dup witness: `vec_id` arrived within τ cosine of the
  * earlier bucket-mate `dup_of` (the earliest qualifying one).
  */
case class VecDup(vec_id: Long, bucket: Long, dup_of: Long, max_cos: Double)

/** G17 `SemanticDedupStream` — the streaming intake gate for
  * EMBEDDINGS: G15's keep-first contract moved to vector space (the
  * SemDeDup admission question "is this new vector a near-duplicate
  * of anything already admitted", asked continuously at corpus intake
  * where the batch D9/D18 are the bootstrap/backfill passes). Every
  * arriving vector hashes into ONE random-hyperplane LSH bucket
  * ([[Bits]] Charikar hyperplanes — E2's kernel at tables=1, so state
  * partitions by signature) and is scored ONLY against its
  * bucket-mates: near-dup (τ-similar) vectors collide in the bucket
  * with high probability, and the cross-bucket misses are exactly the
  * recall tradeoff E2 measures. A vector within τ 6-dp cosine of any
  * EARLIER bucket-mate emits a [[VecDup]] witness naming the earliest
  * qualifying mate; otherwise it is admitted silently.
  *
  * Dup rule: D9's SemDeDup spelling — dup iff ANY earlier mate is
  * ≥ τ — evaluated against the first [[RepCap]] arrivals per bucket
  * (rank-capped representative state), NOT greedy-leader recursion.
  * The rank-cap keeps the rule closed-form (a rank window + pair
  * join), so the batch arm is exactly DuckDB-expressible, while a
  * leaders-only state is a sequential recursion no engine's SQL can
  * replay; the documented tradeoff is that a witness may name a mate
  * that was itself flagged (first-SEEN, not first-KEPT).
  *
  * Determinism: within a micro-batch, vectors process in vec_id
  * order (G15's batch tiebreak), so a vec_id-ordered replay of a
  * corpus produces EXACTLY the registered `stream_semantic_dedup`
  * batch rows regardless of micro-batching (spec-pinned: 1-batch and
  * 3-batch replays are identical, and the sf0.001 corpus replay
  * equals the batch query's dup set).
  *
  * Scale shape: state is ≤ [[RepCap]] (id, vector, norm) triples per
  * DISTINCT bucket, hash-partitioned by bucket across executors —
  * O(buckets · cap · dim) bounded regardless of stream length; each
  * arrival costs one ≤cap-row scan, never a corpus pass. Reference
  * analogy: aiesec.py:142-144's snapshot anti-join asks "what is new
  * vs the store"; this asks it per vector in similarity space.
  */
object SemanticDedupStream {

  // 4 hyperplanes → 16 buckets: the test-SF operating point (recall
  // bites at every SF — 8 bits leaves ~2 mates/bucket at sf0.01 and
  // the gate goes vacuous); production raises Bits with corpus size
  // exactly like E2's bits/tables knobs — state stays O(2^Bits · cap).
  val Bits = 4
  val RepCap = 64 // representatives held per bucket

  val Tau: Double = graft.ann.Ann.SemDedupTau

  /** One stored representative: id, vector, hoisted L2 norm. */
  case class Rep(vec_id: Long, emb: Array[Float], nrm: Double)

  /** Per-bucket state: the first [[RepCap]] vectors seen. */
  case class BucketReps(reps: Seq[Rep])

  /** The E2 kernel at tables=1: the vector's single LSH signature. */
  def bucketOf(emb: Array[Float]): Long =
    graft.functions.VecOps.rhpSigs(new GenericArrayData(emb), Bits, 1)(0)

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Spark's `round(x, n)` (BigDecimal HALF_UP), so the stream's τ
    * compare and witness cosine agree digit-for-digit with the batch
    * arm's `round(col, 6/4)`.
    */
  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  def pipeline(vecs: Dataset[StreamVec]): Dataset[VecDup] = {
    import vecs.sparkSession.implicits._
    vecs.map(v => (bucketOf(v.embedding), v))
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketReps, VecDup](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket, rows, state) => gate(bucket, rows.map(_._2), state)
      }
  }

  private def gate(bucket: Long, rows: Iterator[StreamVec],
      state: GroupState[BucketReps]): Iterator[VecDup] = {
    // batch tiebreak: in-batch vectors gate in vec_id order, so
    // output never depends on task or arrival order
    val sorted = rows.toSeq.sortBy(_.vec_id)
    var reps = state.getOption.map(_.reps.toVector).getOrElse(Vector.empty)
    val out = Seq.newBuilder[VecDup]
    sorted.foreach { v =>
      val nv = math.sqrt(dot(v.embedding, v.embedding))
      val qual = reps.flatMap { r =>
        if (r.vec_id >= v.vec_id) None
        else {
          val c =
            if (r.nrm * nv == 0.0) 0.0
            else dot(r.emb, v.embedding) / (r.nrm * nv)
          if (rnd(c, 6) >= Tau) Some((r.vec_id, rnd(c, 4))) else None
        }
      }
      if (qual.nonEmpty)
        out += VecDup(v.vec_id, bucket,
          qual.map(_._1).min, qual.map(_._2).max)
      if (reps.size < RepCap)
        reps :+= Rep(v.vec_id, v.embedding, nv)
    }
    state.update(BucketReps(reps))
    out.result().iterator
  }
}
