package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Deterministic HyperLogLog (classic Flajolet et al. '07 estimator,
  * p = 12 → 4096 one-byte registers, ~1.6% relative error) whose every
  * step is replayable by an independent engine — which is what lets the
  * DuckDB oracle verify the approx-distinct queries EXACTLY instead of
  * rows-only:
  *
  *  - value hash = splitmix64 ([[VecOps.mix64]]), plain wrapping integer
  *    arithmetic (same kernel the minhash/simhash oracles replay in
  *    HUGEINT modular SQL);
  *  - register index = low p bits, rho = leading-zero count of the
  *    remaining 52-bit field + 1, capped at 31;
  *  - the harmonic sum is folded as the EXACT integer Σ 2^(31 − M_j)
  *    (the rho cap keeps it ≤ 4096·2^31 < 2^63), so the only floating
  *    point is one division, one comparison, and the linear-counting
  *    log — each spelled identically in the SQL replay.
  *
  * Unlike Spark's built-in HLL++ (whose empirical bias-interpolation
  * tables are impractical to replay in SQL) this trades ~1 p.p. of
  * accuracy near the small-range boundary for cross-engine
  * verifiability; the ±5% spec bound and merge ≡ direct still hold.
  */
object HllOps {
  val P = 12
  val NumRegs: Int = 1 << P // 4096
  val RhoCap = 31

  /** α·m²·2³¹ — the numerator constant of the scaled harmonic estimate,
    * computed once here and interpolated verbatim (shortest round-trip
    * decimal) into the oracle SQL so both engines divide the exact same
    * double.
    */
  val AlphaM2Two31: Double =
    ((0.7213 / (1.0 + 1.079 / 4096.0)) * 16777216.0) * 2147483648.0

  def emptyRegs(): Array[Byte] = new Array[Byte](NumRegs)

  def update(regs: Array[Byte], value: Long): Unit = {
    val h = VecOps.mix64(value)
    val bucket = (h & (NumRegs - 1)).toInt
    val w = h >>> P
    // w occupies the low 52 bits, so nlz(w) ≥ 12; field zeros = nlz − 12
    val rho = math.min(java.lang.Long.numberOfLeadingZeros(w) - P + 1, RhoCap)
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < NumRegs) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Estimate with linear-counting small-range correction; rounded via
    * floor(x + 0.5) (identical spelling in the SQL oracle — DuckDB and
    * the JVM agree on floor, where round() conventions can drift).
    */
  def estimate(regs: Array[Byte]): Long = {
    var s = 0L
    var v = 0
    var i = 0
    while (i < NumRegs) {
      s += 1L << (RhoCap - regs(i))
      if (regs(i) == 0) v += 1
      i += 1
    }
    val raw = AlphaM2Two31 / s.toDouble
    val est =
      if (raw <= 2.5 * NumRegs && v > 0) 4096.0 * math.log(4096.0 / v)
      else raw
    math.floor(est + 0.5).toLong
  }
}

/** `hll_agg(bigint) -> binary` — build a 4096-byte deterministic HLL
  * register sketch. Partials are the registers themselves; merge is
  * element-wise max (associative + commutative), so map-side combine
  * ships KBs per group regardless of input size — the 100 TB distinct
  * path.
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case LongType | IntegerType => true })

  override def createAggregationBuffer(): Array[Byte] = HllOps.emptyRegs()

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      HllOps.update(buf, x)
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllOps.merge(a, b)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

/** `hll_merge(binary) -> binary` — union stored sketches by register
  * max: any time-range rollup is a merge of daily partials, never a
  * rescan of the raw events (see `agg_hll_partial`).
  */
case class HllMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case BinaryType => true })

  override def createAggregationBuffer(): Array[Byte] = HllOps.emptyRegs()

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllOps.merge(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllOps.merge(a, b)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMerge =
    copy(child = newChildren.head)
}

/** `hll_estimate(binary) -> bigint` — distinct-count estimate of a
  * register sketch (codegen: one static call, stays in whole-stage).
  */
case class HllEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case BinaryType => true })
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_estimate"

  override def nullSafeEval(a: Any): Any =
    HllOps.estimate(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HllOps.estimate($a);")

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

object HllSketch {
  def hllAgg(c: Column): Column =
    GraftShim.column(HllAgg(GraftShim.expression(c)).toAggregateExpression())
  def hllMerge(c: Column): Column =
    GraftShim.column(HllMerge(GraftShim.expression(c)).toAggregateExpression())
  def hllEstimate(c: Column): Column =
    GraftShim.column(HllEstimate(GraftShim.expression(c)))
}
