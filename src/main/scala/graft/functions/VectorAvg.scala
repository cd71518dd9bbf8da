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

/** `vector_avg(array<float>) -> array<float>` — element-wise mean of
  * float vectors as a real Catalyst aggregate with mergeable partials
  * (buffer = double sums + count), so centroid computation is a single
  * map-side-combined groupBy instead of posexplode → 64× rows → two
  * shuffles. The building block for k-means-style refinement (E3) at
  * any scale.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vector_avg"

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case ArrayType(FloatType, _) => true })

  // buffer layout: [sum_0 .. sum_{d-1}, count]; empty = zero-length
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) new Array[Double](d + 1) else buf
    require(b.length == d + 1,
      s"vector_avg: inconsistent dimensions ${b.length - 1} vs $d")
    var i = 0
    while (i < d) { b(i) += arr.getFloat(i); i += 1 }
    b(d) += 1
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a.length == b.length, "vector_avg: inconsistent dimensions")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.isEmpty) return null
    val d = buf.length - 1
    val n = buf(d)
    val out = new Array[Any](d)
    var i = 0
    while (i < d) { out(i) = (buf(i) / n).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorAvg =
    copy(child = newChildren.head)
}

object VectorAvg {
  def vectorAvg(c: Column): Column =
    GraftShim.column(
      VectorAvg(GraftShim.expression(c)).toAggregateExpression())
}
