package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** H12 `quantile_sketch(double, qs) -> array<double>` — a KLL-style
  * mergeable quantile sketch as a real Catalyst aggregate, completing
  * the sketch family (B35 HLL distincts, C28 CMS point frequencies,
  * H9 MG heavy hitters): bounded-memory rank estimation with
  * tree-mergeable partials.
  *
  * Structure: levels of weight 2^level; inserts land in level 0; a
  * level past capacity sorts and keeps alternating survivors, pushing
  * them one level up (each survivor then counts for 2× weight). State
  * is O(levels × k) = O(k log(n/k)) values PER PARTITION regardless of
  * input size — the 100 TB story: an exact per-key percentile needs a
  * full sort-shuffle of the fact table, this reduces each map
  * partition to KBs before the exchange, exactly like the HLL/MG
  * partial pattern. Rank error is O(n / k) with small constants
  * (spec-pinned ≤ 2 % at k = 200 on the sf corpus, including under
  * repartitioning).
  *
  * DELIBERATELY spec-only, no DuckDB oracle row: compaction depends on
  * merge ORDER, which Spark does not fix across partitionings, so no
  * cross-engine (or even cross-run-layout) bitwise replay exists — the
  * invariant worth pinning is the rank-error BOUND, and the spec does.
  * Deterministic alternation (keep odd ranks) replaces KLL's random
  * coin so a single fixed layout at least replays itself.
  */
case class QuantileSketch(
    child: Expression,
    quantiles: Seq[Double],
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Levels] {

  require(capacity >= 8, "quantile_sketch: capacity must be >= 8")
  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
    "quantile_sketch: quantiles must lie in [0, 1]")

  import QuantileSketch.Levels

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantile_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case DoubleType => true })

  override def createAggregationBuffer(): Levels = new Levels

  override def update(buf: Levels, input: InternalRow): Levels = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double], capacity)
    buf
  }

  override def merge(a: Levels, b: Levels): Levels = {
    a.absorb(b, capacity)
    a
  }

  override def eval(buf: Levels): Any =
    new GenericArrayData(quantiles.map(buf.quantile).toArray)

  override def serialize(buf: Levels): Array[Byte] =
    QuantileSketch.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Levels =
    QuantileSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren.head)
}

object QuantileSketch {

  /** Wire format shared by the aggregate's partial exchange and the
    * streaming state store (G14 keeps a serialized sketch per key):
    * level count, then each level's size + doubles.
    */
  def toBytes(buf: Levels): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.levels.size)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.size)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): Levels = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val l = new Levels
    // the fresh Levels ships with an empty level 0 — REPLACE it with
    // the read levels rather than appending after it. Appending (the
    // original deserialize) shifted every read level up one slot,
    // uniformly doubling all weights: quantiles normalize the total
    // away so estimates stayed right, but totalWeight from a
    // round-tripped partial read 2× the true count, and any merge of
    // buffers at DIFFERENT round-trip depths would mis-weight one
    // side's data against the other's.
    l.levels.clear()
    val nLevels = in.readInt()
    var i = 0
    while (i < nLevels) {
      val n = in.readInt()
      val b = mutable.ArrayBuffer.empty[Double]
      var j = 0
      while (j < n) { b += in.readDouble(); j += 1 }
      l.levels += b
      i += 1
    }
    if (l.levels.isEmpty) l.levels += mutable.ArrayBuffer.empty[Double]
    l
  }

  /** Compacting level buffers; level i items carry weight 2^i. */
  final class Levels {
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])

    def insert(v: Double, cap: Int): Unit = {
      levels(0) += v
      compactFrom(0, cap)
    }

    /** Compact any level past capacity: sort, keep odd ranks (the
      * deterministic stand-in for KLL's coin), push survivors up.
      */
    private def compactFrom(start: Int, cap: Int): Unit = {
      var i = start
      while (i < levels.size) {
        if (levels(i).size > cap) {
          val sorted = levels(i).sorted
          if (i + 1 == levels.size)
            levels += mutable.ArrayBuffer.empty[Double]
          val up = levels(i + 1)
          levels(i).clear()
          // an odd element can't pair for promotion: it stays at this
          // level, so total weight is conserved exactly
          val odd = sorted.size % 2 == 1
          if (odd) levels(i) += sorted(0)
          var j = if (odd) 2 else 1
          while (j < sorted.size) { up += sorted(j); j += 2 }
        }
        i += 1
      }
    }

    def absorb(other: Levels, cap: Int): Unit = {
      while (levels.size < other.levels.size)
        levels += mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < other.levels.size) {
        levels(i) ++= other.levels(i)
        i += 1
      }
      compactFrom(0, cap)
    }

    def totalWeight: Long = {
      var w = 0L
      var i = 0
      while (i < levels.size) {
        w += levels(i).size.toLong << i
        i += 1
      }
      w
    }

    /** Weighted-rank quantile over all stored (value, 2^level) pairs. */
    def quantile(q: Double): Double = {
      val items = mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.size) {
        levels(i).foreach(v => items += ((v, 1L << i)))
        i += 1
      }
      if (items.isEmpty) return Double.NaN
      val sorted = items.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      val target = math.min((q * total).toLong, total - 1)
      var acc = 0L
      var k = 0
      while (k < sorted.size) {
        acc += sorted(k)._2
        if (acc > target) return sorted(k)._1
        k += 1
      }
      sorted.last._1
    }
  }

  def quantileSketch(c: Column, qs: Seq[Double], capacity: Int = 200): Column =
    GraftShim.column(
      QuantileSketch(GraftShim.expression(c), qs, capacity)
        .toAggregateExpression())
}
