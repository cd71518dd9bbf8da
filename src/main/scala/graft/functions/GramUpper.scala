package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `gram_upper(array<float>) -> array<bigint>` — EXACT integer Gram
  * matrix accumulation (upper triangle, row-major) over quantized
  * components: each vector is quantized once to micro-units
  * (floor(x·1e6) — floor of a double is engine-exact where round is
  * not), then every product q_i·q_j (i ≤ j) is added into a
  * d(d+1)/2-long integer buffer. Integer partials make the aggregate
  * ORDER-INDEPENDENT — the same Gram matrix on any partitioning, any
  * merge tree, any engine — which is what lets a downstream
  * eigen-iteration be replayed bit-exactly in SQL (E14 `emb_pca`).
  *
  * Scale: one pass, mergeable O(d²) buffer (64-dim → 2 080 longs =
  * 16 KB per partition), no row explosion — the posexplode spelling
  * the oracle uses fans out d²·rows. i64 headroom: |q| ≤ ~5·10⁵ for
  * unit-normish inputs → ~10¹¹ per product, safe past 10⁷ rows per
  * partition; widen to two-level accumulation beyond.
  */
case class GramUpper(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_upper"

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case ArrayType(FloatType, _) => true })

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) new Array[Long](d * (d + 1) / 2) else buf
    require(b.length == d * (d + 1) / 2,
      s"gram_upper: inconsistent dimensions (buffer ${b.length}, d=$d)")
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      q(i) = math.floor(arr.getFloat(i).toDouble * 1e6).toLong
      i += 1
    }
    var k = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) { b(k) += q(i) * q(j); k += 1; j += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a.length == b.length, "gram_upper: inconsistent dimensions")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf.isEmpty) return null
    new GenericArrayData(buf.map(_.asInstanceOf[Any]))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramUpper =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramUpper =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramUpper =
    copy(child = newChildren.head)
}

object GramUpper {
  def gramUpper(c: Column): Column =
    GraftShim.column(
      GramUpper(GraftShim.expression(c)).toAggregateExpression())
}
