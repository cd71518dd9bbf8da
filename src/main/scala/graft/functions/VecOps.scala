package graft.functions


import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the custom Catalyst expressions (H1–H3).
  *
  * Kept as plain static methods so `doGenCode` can emit a single call —
  * the expression stays inside whole-stage codegen and the JIT inlines
  * the loop; no boxing, no UDF serialization.
  */
object VecOps {

  /** Cosine similarity of two float vectors, accumulated in double.
    * Zero-norm inputs → 0.0 (defined, never NaN).
    */
  def cosineF(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val d = math.sqrt(nx) * math.sqrt(ny)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Dot product of two float vectors, accumulated in double. */
  def dotF(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  /** y = Rᵀx: a float vector against a flat row-major (outDim × inDim)
    * double matrix. Per output component: index-ordered double
    * accumulation from 0.0, then a float cast — exactly the
    * `CAST(list_dot_product(CAST(x AS DOUBLE[]), col_j) AS REAL)`
    * shape the oracle replays, one tight loop per row instead of a
    * 4096-node expression tree.
    */
  def matVecF(x: ArrayData, m: Array[Double], outDim: Int,
      inDim: Int): ArrayData = {
    val n = x.numElements()
    require(n == inDim && m.length == outDim * inDim,
      s"mat_vec_f: vector length $n vs matrix ${outDim}x$inDim " +
        s"(flat ${m.length})")
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      val base = j * inDim
      var i = 0
      while (i < inDim) { acc += x.getFloat(i).toDouble * m(base + i); i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  /** y[j] = x[perm(j)]: gather a float vector through a plan-baked
    * index array (the E25 variance-balancing permutation apply). One
    * static call per row — the array(getItem…) spelling this replaces
    * inlined 64 element reads into whichever whole-stage-codegen
    * method consumed the permuted column, which (fused with the
    * unrolled subvector split, r16) overflowed janino's 64 KB method
    * limit and silently de-compiled the stage.
    */
  def permuteF(x: ArrayData, perm: Array[Int]): ArrayData = {
    val out = new Array[Any](perm.length)
    var j = 0
    while (j < perm.length) { out(j) = x.getFloat(perm(j)); j += 1 }
    new GenericArrayData(out)
  }

  /** Integer dot product of two int vectors (quantized embeddings). */
  def dotI(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    dot
  }

  /** Stable 64-bit hash of UTF-8 bytes: seed-initialized polynomial
    * fold finished with the splitmix64 avalanche. Chosen over
    * MurmurHash3 deliberately: every step is plain wrapping integer
    * arithmetic, so an independent engine (the DuckDB oracle) can
    * replay it exactly with 128-bit modular arithmetic — which is what
    * upgrades the minhash/simhash dedup operators from rows-only checks
    * to full cross-engine hash-match verification. Avalanche quality
    * for sketching comes from the splitmix64 finalizer (Steele et al.,
    * the SplittableRandom mixer).
    */
  def hash64(b: Array[Byte], seed: Int): Long = {
    var h = seed.toLong & 0xffffffffL
    var i = 0
    while (i < b.length) {
      h = h * 1000003L + (b(i) & 0xff)
      i += 1
    }
    mix64(h)
  }

  /** One-pass MinHash signature over a string array (H3).
    *
    * Universal-hash family via double hashing: `h_i = a + i*b` over the
    * full 64-bit ring, min taken unsigned per permutation — one hash per
    * element instead of `numHashes`, the standard trick (Broder '97).
    */
  def minhash(elems: ArrayData, numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(-1L) // unsigned max
    val n = elems.numElements()
    var j = 0
    while (j < n) {
      val s = elems.getUTF8String(j)
      if (s != null) {
        val bytes = s.getBytes
        val a = hash64(bytes, 0x9747b28c)
        // odd multiplier keeps the step a unit mod 2^64
        val b = hash64(bytes, 0x85ebca6b) | 1L
        var i = 0
        var h = a
        while (i < numHashes) {
          if (java.lang.Long.compareUnsigned(h, sig(i)) < 0) sig(i) = h
          h += b
          i += 1
        }
      }
      j += 1
    }
    sig
  }

  /** One-pass 64-bit SimHash over a string array (H2/D4, Charikar '02):
    * per-bit vote of each element's 64-bit hash, sign of the vote sets
    * the output bit.
    */
  def simhash64(elems: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = elems.numElements()
    var j = 0
    while (j < n) {
      val s = elems.getUTF8String(j)
      if (s != null) {
        val h = hash64(s.getBytes, 0x9747b28c)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      j += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Polynomial rolling hash (Karp–Rabin) over UTF-8 bytes in the full
    * 64-bit ring: h = Σ b_i·B^(n-1-i), B odd prime-ish. One pass,
    * order-sensitive — the streaming-friendly document fingerprint
    * (an incremental update needs only the previous hash + new byte).
    */
  def rollingHash64(s: UTF8String): Long = {
    val b = s.getBytes
    var h = 0L
    var i = 0
    while (i < b.length) {
      h = h * 1000003L + (b(i) & 0xff)
      i += 1
    }
    h
  }

  private val RhBase = 1000003L // rollingHash64's radix

  /** Karp–Rabin hashes of every sliding W-TOKEN window, O(n + windows)
    * — the kernel under exact-substring dedup (D12). Tokens are
    * maximal non-whitespace runs (Java `\s` set — `split(trim(s),
    * "\\s+")` semantics); the hashed byte stream for window i is the
    * single-space join of tokens i..i+w-1, and each output value is
    * BIT-IDENTICAL to [[rollingHash64]] of that joined string
    * (spec-pinned). The rolling property does the work: one prefix
    * fold over the canonical "tok₀ tok₁ …" stream plus a power table,
    * then every window hash is two lookups and one wrapping
    * multiply-subtract — H(a..b) = P(b) − P(a)·B^(b−a) in the mod-2⁶⁴
    * ring — instead of the O(n·w) re-fold a per-window digest (D7's
    * aligned-segment md5) would pay on SLIDING windows.
    * Fewer than w tokens → empty array.
    */
  def rollingWinHashes(s: UTF8String, w: Int): ArrayData = {
    val b = s.getBytes
    def ws(c: Byte): Boolean = c == ' ' || c == '\t' || c == '\n' ||
      c == 0x0b || c == '\f' || c == '\r'
    // token spans over the raw bytes
    var m = 0
    val starts = new Array[Int](b.length / 2 + 1)
    val ends = new Array[Int](b.length / 2 + 1)
    var i = 0
    while (i < b.length) {
      if (!ws(b(i))) {
        starts(m) = i
        while (i < b.length && !ws(b(i))) i += 1
        ends(m) = i
        m += 1
      } else i += 1
    }
    if (m < w) return new GenericArrayData(Array.empty[Any])
    // prefix hashes of the canonical single-space-joined stream,
    // recorded at token starts/ends, plus B^k for every k ≤ stream len
    val hs = new Array[Long](m) // P(canonical start of token k)
    val he = new Array[Long](m) // P(canonical end of token k)
    val cs = new Array[Int](m) // canonical start offset of token k
    val ce = new Array[Int](m)
    var h = 0L
    var pos = 0
    var k = 0
    while (k < m) {
      if (k > 0) { h = h * RhBase + ' '.toInt; pos += 1 }
      hs(k) = h; cs(k) = pos
      var j = starts(k)
      while (j < ends(k)) { h = h * RhBase + (b(j) & 0xff); j += 1 }
      pos += ends(k) - starts(k)
      he(k) = h; ce(k) = pos
      k += 1
    }
    val pow = new Array[Long](pos + 1)
    pow(0) = 1L
    i = 1
    while (i <= pos) { pow(i) = pow(i - 1) * RhBase; i += 1 }
    val out = new Array[Any](m - w + 1)
    i = 0
    while (i <= m - w) {
      val a = cs(i); val bEnd = ce(i + w - 1)
      out(i) = he(i + w - 1) - hs(i) * pow(bEnd - a)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** splitmix64 finalizer — cheap stateless bit mixer. Public: also the
    * value hash of the deterministic HLL sketch (HllOps).
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Random-hyperplane LSH signatures (Charikar '02) for `tables`
    * independent tables of `bits` hyperplanes each. Hyperplane weights
    * are deterministic ±1 from a stateless hash of (table, bit, dim) —
    * no stored plane matrix, identical on every executor.
    */
  def rhpSigs(vec: ArrayData, bits: Int, tables: Int): Array[Long] = {
    val n = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var d = 0
        while (d < n) {
          val w = if ((mix64((t.toLong << 40) ^ (b.toLong << 20) ^ d) & 1L) == 0L) 1.0 else -1.0
          dot += w * vec.getFloat(d)
          d += 1
        }
        if (dot > 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  /** Distinct word n-gram shingles, first-occurrence order. One pass,
    * no intermediate arrays — the HOF equivalent
    * (transform+sequence+concat+array_distinct) is CodegenFallback and
    * collapses throughput when evaluated under a Generate (explode).
    */
  def wordShingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    val out = new java.util.LinkedHashSet[UTF8String]
    val parts = new Array[UTF8String](2 * n - 1)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        parts(2 * j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        if (j < n - 1) parts(2 * j + 1) = space
        j += 1
      }
      out.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  /** Exact Jaccard similarity of two string arrays (distinct elements),
    * used as the verify step after LSH candidate generation.
    */
  def jaccard(x: ArrayData, y: ArrayData): Double = {
    val sx = new java.util.HashSet[UTF8String]()
    val sy = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < x.numElements()) { val v = x.getUTF8String(i); if (v != null) sx.add(v); i += 1 }
    i = 0
    while (i < y.numElements()) { val v = y.getUTF8String(i); if (v != null) sy.add(v); i += 1 }
    if (sx.isEmpty && sy.isEmpty) return 0.0
    var inter = 0
    val it = sx.iterator()
    while (it.hasNext) if (sy.contains(it.next())) inter += 1
    inter.toDouble / (sx.size + sy.size - inter).toDouble
  }

  /** Shannon entropy (bits/char) of a string's code-point distribution
    * — the cheap gibberish/boilerplate detector: natural text sits
    * ~4–4.5 bits, runs of one char near 0, random bytes near 8.
    * Counts accumulate in a sorted map so the summation order is
    * deterministic regardless of input order.
    */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Int, Long]()
    var n = 0L
    val it = str.codePoints().iterator()
    while (it.hasNext) {
      val cp = it.nextInt()
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
    }
    var h = 0.0
    val vit = counts.values().iterator()
    while (vit.hasNext) {
      val p = vit.next().toDouble / n
      h -= p * (math.log(p) / math.log(2.0))
    }
    h
  }

  /** Spread the low 32 bits of x into the even bit positions of a long
    * (standard Morton-code magic-mask expansion).
    */
  private def spreadBits(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton (Z-order) code of two 32-bit keys: bits of a and b
    * alternate, so sorting by the result clusters rows that are close
    * in BOTH dimensions. Inputs are clamped to [0, 2^32).
    */
  def zValue(a: Long, b: Long): Long = {
    val ca = math.min(math.max(a, 0L), 0xFFFFFFFFL)
    val cb = math.min(math.max(b, 0L), 0xFFFFFFFFL)
    spreadBits(ca) | (spreadBits(cb) << 1)
  }
}
