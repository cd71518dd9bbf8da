package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `misra_gries(string, k) -> map<string,bigint>` — bounded-memory
  * frequent-items sketch as a real Catalyst aggregate with mergeable
  * partials. The buffer holds at most k counters; any item whose true
  * frequency exceeds N/(k+1) is GUARANTEED to survive (counts are
  * underestimates by at most N/(k+1)), so with k ≥ 1/θ the sketch
  * yields a superset of all θ-heavy hitters.
  *
  * The scale story: a full `groupBy(token)` shuffles one row per
  * distinct key — at 100 TB that exchange carries the entire long-tail
  * vocabulary. This sketch reduces each map partition to ≤ k counters
  * before the exchange, and a second exact pass over just the ≤ k
  * candidates (broadcast membership filter, pruned pre-shuffle) turns
  * the approximate sketch into an exact answer.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries"): sum counters,
  * then subtract the (k+1)-th largest value from all and drop ≤ 0 —
  * error bounds add, so the superset guarantee survives tree and
  * final aggregation.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "misra_gries: capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case StringType => true })

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // own the bytes; UTF8String may alias a reused row
    MisraGries.fold(buf, v.toString, capacity)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGries.mergeInto(a, b, capacity)

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val ks = new Array[Any](buf.size)
    val vs = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (k, c) =>
      ks(i) = UTF8String.fromString(k); vs(i) = c; i += 1
    }
    ArrayBasedMapData(ks, vs)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    MisraGries.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MisraGries.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  def misraGries(c: Column, capacity: Int): Column =
    GraftShim.column(
      MisraGries(GraftShim.expression(c), capacity).toAggregateExpression())

  // The sketch kernel as statics shared by the batch aggregate above
  // and the G19 streaming state machine (HeavyHittersStream) — one
  // code path for the partial exchange and the state store, the
  // H12/G14 pattern.

  /** Fold ONE item into a ≤ capacity-counter MG buffer: increment if
    * tracked, insert if there's room, else the classic decrement-all
    * (O(k) here, amortized O(1) — every decrement cancels one prior
    * increment).
    */
  def fold(buf: mutable.HashMap[String, Long], key: String,
      capacity: Int): Unit =
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < capacity => buf.update(key, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (k, c) =>
          if (c == 1L) dead += k else buf.update(k, c - 1)
        }
        dead.foreach(buf.remove)
    }

  /** Merge `b` into `a` (Agarwal et al., "Mergeable Summaries"): sum
    * counters, then subtract the (k+1)-th largest value from all and
    * drop ≤ 0 — error bounds add, so the superset guarantee survives
    * tree and final aggregation.
    */
  def mergeInto(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long],
      capacity: Int): mutable.HashMap[String, Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (k+1)-th largest count, keep strictly positive
      val cut = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else a.update(k, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  def toBytes(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    m
  }
}
