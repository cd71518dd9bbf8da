package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim.column
import org.apache.spark.sql.types._

/** Custom Catalyst expressions (SURVEY.md §2.H): native vector / hash
  * kernels that built-in `functions._` can't express in one pass.
  * Each `doGenCode` emits a single static call into [[VecOps]], so the
  * operators stay inside whole-stage codegen (no UDF boxing, no
  * interpreted fallback) — the preferred extension path for hot loops.
  */

/** H1 `cosine_sim(array<float>, array<float>) -> double`. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(left, right),
      { case ArrayType(FloatType, _) => true })
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.cosineF($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `dot_f(array<float>, array<float>) -> double` — plain dot product.
  * Pairs with a hoisted per-row norm so quadratic similarity stages
  * (pairwise verify, brute-force scoring) do 1/3 of cosine_sim's work:
  * cos(a,b) = dot_f(a,b) / (norm_a * norm_b), norms computed once per
  * ROW instead of once per PAIR.
  */
case class DotF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(left, right),
      { case ArrayType(FloatType, _) => true })
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.dotF($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

/** `dot_i(array<int>, array<int>) -> long` — integer dot product for
  * int8-quantized embeddings (values fit int; the product sum fits
  * long). The candidate-generation kernel of the quantized
  * retrieve-then-rerank ANN path.
  */
case class DotI(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(left, right),
      { case ArrayType(IntegerType, _) => true })
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotI(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.dotI($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI =
    copy(left = newLeft, right = newRight)
}

/** `mat_vec_f(array<float>) -> array<float>` — dense matrix-vector
  * product against a plan-baked rotation matrix (flat row-major
  * outDim × inDim doubles): the E28 OPQ rotation apply. Per output
  * component the kernel is an index-ordered double dot then a float
  * cast, so the DuckDB replay (`list_dot_product` + REAL cast) is
  * bit-identical; `doGenCode` ships the matrix as a codegen reference
  * object and the whole apply stays one static call inside
  * whole-stage codegen.
  */
case class MatVecF(child: Expression,
    m: scala.collection.immutable.ArraySeq[Double], outDim: Int)
    extends UnaryExpression {
  require(outDim > 0 && m.length % outDim == 0,
    s"mat_vec_f: flat matrix length ${m.length} not a multiple of $outDim")

  /** Matrix held as an IndexedSeq so case-class equality (and hence
    * Catalyst canonicalization / subexpression elimination / exchange
    * reuse) is structural, not reference — two independently flattened
    * copies of the same rotation compare equal. */
  private val inDim: Int = m.length / outDim
  @transient private lazy val flat: Array[Double] =
    m.unsafeArray.asInstanceOf[Array[Double]]

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case ArrayType(FloatType, _) => true })
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "mat_vec_f"

  override def nullSafeEval(v: Any): Any =
    VecOps.matVecF(v.asInstanceOf[ArrayData], flat, outDim, inDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("rotm", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VecOps.matVecF($v, $mRef, $outDim, $inDim);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MatVecF =
    copy(child = newChild)
}

/** `permute_f(array<float>) -> array<float>` — gather through a
  * plan-baked index array (E25's variance-balancing permutation):
  * element j of the output is element perm(j) of the input, float in,
  * float out, values identical to the `array(x[perm(0)], …)` literal
  * spelling it replaces — but ONE static call inside whole-stage
  * codegen instead of 64 inlined element reads (see
  * [[VecOps.permuteF]] for the 64 KB-method story). Permutation held
  * as an IndexedSeq so canonicalization is structural (the MatVecF
  * rule).
  */
case class PermuteF(child: Expression,
    perm: scala.collection.immutable.ArraySeq[Int])
    extends UnaryExpression {
  require(perm.nonEmpty, "permute_f: empty permutation")

  @transient private lazy val idx: Array[Int] =
    perm.unsafeArray.asInstanceOf[Array[Int]]

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case ArrayType(FloatType, _) => true })
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "permute_f"

  override def nullSafeEval(v: Any): Any =
    VecOps.permuteF(v.asInstanceOf[ArrayData], idx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("perm", idx, "int[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VecOps.permuteF($v, $pRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PermuteF =
    copy(child = newChild)
}

/** H3 `minhash_sig(array<string>, k) -> array<long>` — one-pass k-perm
  * MinHash signature.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case ArrayType(StringType, _) => true })
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      VecOps.minhash(a.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.VecOps.minhash($a, $numHashes));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** H2 `simhash64(array<string>) -> long` — 64-bit SimHash. Its distance
  * companion needs no custom code: `bit_count(a ^ b)` is already native.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case ArrayType(StringType, _) => true })
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    VecOps.simhash64(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecOps.simhash64($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `jaccard_sim(array<string>, array<string>) -> double` — exact
  * distinct-element Jaccard, the verify kernel after LSH banding.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(left, right),
      { case ArrayType(StringType, _) => true })
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

/** `rhp_sigs(array<float>, bits, tables) -> array<long>` — one LSH
  * signature per hash table, from deterministic ±1 hyperplanes.
  */
case class RhpSigs(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case ArrayType(FloatType, _) => true })
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_sigs"

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      VecOps.rhpSigs(a.asInstanceOf[ArrayData], bits, tables))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.VecOps.rhpSigs($a, $bits, $tables));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RhpSigs =
    copy(child = newChild)
}

/** `word_shingles(array<string>, n) -> array<string>` — distinct word
  * n-grams in one pass. Exists because the built-in HOF spelling
  * (transform + sequence + concat + array_distinct) is CodegenFallback:
  * fine in a projection, pathological under explode.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case ArrayType(StringType, _) => true })
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(a: Any): Any =
    VecOps.wordShingles(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecOps.wordShingles($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `rolling_hash64(string) -> long` — Karp–Rabin polynomial fingerprint. */
case class RollingHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case StringType => true })
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(a: Any): Any =
    VecOps.rollingHash64(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecOps.rollingHash64($a);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** `rolling_win_hashes(string, w) -> array<long>` — Karp–Rabin hash of
  * EVERY sliding w-token window (single-space joined), O(n + windows)
  * via the rolling prefix/power decomposition instead of the O(n·w)
  * per-window re-fold: the exact-substring-dedup kernel (D12). Each
  * element is bit-identical to `rolling_hash64` of that window's
  * joined string (spec-pinned).
  */
case class RollingWinHashes(child: Expression, w: Int)
    extends UnaryExpression {
  require(w > 0, s"rolling_win_hashes: window must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case StringType => true })
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_win_hashes"

  override def nullSafeEval(a: Any): Any =
    VecOps.rollingWinHashes(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecOps.rollingWinHashes($a, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): RollingWinHashes =
    copy(child = newChild)
}

/** `char_entropy(string) -> double` — Shannon entropy of the
  * code-point distribution, bits/char: the zero-shuffle gibberish /
  * boilerplate signal for corpus quality gates (a full SQL spelling
  * explodes one row per character and shuffles them all).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(child),
      { case StringType => true })
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(a: Any): Any =
    VecOps.charEntropy(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecOps.charEntropy($a);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** `z_value(bigint, bigint) -> bigint` — 64-bit Morton (Z-order) code:
  * the data-layout key behind multi-dimensional clustering. Sorting /
  * range-partitioning by it keeps rows close in BOTH input dimensions
  * inside the same file, so min/max footer stats prune scans on either
  * predicate column (see `graft.etl.ZorderWriter`).
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.checkTypes(prettyName, Seq(left, right),
      { case LongType => true })
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.zValue(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.zValue($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

/** Column-API facade for the custom expressions — use these exactly like
  * `org.apache.spark.sql.functions._`.
  */
object GraftFunctions {
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def dotF(a: Column, b: Column): Column =
    column(DotF(expression(a), expression(b)))
  def dotI(a: Column, b: Column): Column =
    column(DotI(expression(a), expression(b)))
  def matVecF(a: Column, m: Array[Double], outDim: Int): Column =
    column(MatVecF(expression(a),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(m), outDim))
  def permuteF(a: Column, perm: Array[Int]): Column =
    column(PermuteF(expression(a),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(perm)))
  def minhashSig(a: Column, k: Int): Column =
    column(MinHashSig(expression(a), k))
  def simhash64(a: Column): Column = column(SimHash64(expression(a)))
  def jaccardSim(a: Column, b: Column): Column =
    column(JaccardSim(expression(a), expression(b)))
  def rhpSigs(a: Column, bits: Int, tables: Int): Column =
    column(RhpSigs(expression(a), bits, tables))
  def wordShingles(a: Column, n: Int): Column =
    column(WordShingles(expression(a), n))
  def rollingHash64(a: Column): Column = column(RollingHash64(expression(a)))
  def rollingWinHashes(a: Column, w: Int): Column =
    column(RollingWinHashes(expression(a), w))
  def zValue(a: Column, b: Column): Column =
    column(ZValue(expression(a), expression(b)))
  def charEntropy(a: Column): Column = column(CharEntropy(expression(a)))

  private def expression(c: Column): Expression =
    org.apache.spark.sql.GraftShim.expression(c)

  private[functions] def checkTypes(fn: String, children: Seq[Expression],
      ok: PartialFunction[DataType, Boolean]): TypeCheckResult = {
    val bad = children.filterNot(c => ok.lift(c.dataType).getOrElse(false))
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$fn: unexpected input types " +
      bad.map(_.dataType.simpleString).mkString(", "))
  }
}
