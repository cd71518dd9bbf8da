package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (raw ScalaCheck) for the static kernels behind the
  * custom expressions — pure functions, so no Spark session needed.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def arr(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def farr(xs: Seq[Float]): GenericArrayData =
    new GenericArrayData(xs.map(_.asInstanceOf[Any]).toArray)

  private val tokens = Gen.listOf(Gen.oneOf(
    "a", "b", "c", "word", "table", "spark", "row", "key"))
  private val vecs = Gen.listOfN(16, Gen.chooseNum(-5f, 5f))

  test("jaccard ∈ [0,1], symmetric, 1 on self (non-empty)") {
    check(Prop.forAll(tokens, tokens) { (x, y) =>
      val j = VecOps.jaccard(arr(x), arr(y))
      j >= 0.0 && j <= 1.0 &&
        j == VecOps.jaccard(arr(y), arr(x)) &&
        (x.isEmpty || VecOps.jaccard(arr(x), arr(x)) == 1.0)
    })
  }

  test("minhash signature agreement tracks jaccard (within 0.25 at k=128)") {
    check(Prop.forAll(tokens, tokens) { (x, y) =>
      (x.nonEmpty && y.nonEmpty) ==> {
        val j = VecOps.jaccard(arr(x), arr(y))
        val sx = VecOps.minhash(arr(x), 128)
        val sy = VecOps.minhash(arr(y), 128)
        val est = sx.zip(sy).count { case (a, b) => a == b } / 128.0
        math.abs(est - j) <= 0.25
      }
    })
  }

  test("rollingWinHashes ≡ rollingHash64 of each space-joined window") {
    val wsTok = Gen.listOf(Gen.oneOf(
      "a", "bb", "ccc", "word", "x1", "Σσ", "käse")) // incl. multi-byte
    val wGen = Gen.chooseNum(1, 5)
    val pad = Gen.oneOf("", " ", "  ", "\t", "\n ")
    check(Prop.forAll(wsTok, wGen, pad, pad) { (ts, w, lead, trail) =>
      val raw = lead + ts.mkString(" ") + trail
      val got = VecOps.rollingWinHashes(UTF8String.fromString(raw), w)
      val want =
        if (ts.length < w) Array.empty[Long]
        else ts.sliding(w).map(win =>
          VecOps.rollingHash64(
            UTF8String.fromString(win.mkString(" ")))).toArray
      got.numElements() == want.length &&
        want.indices.forall(i => got.getLong(i) == want(i))
    })
  }

  test("rollingWinHashes splits on every Java \\s whitespace kind") {
    val s = "one\ttwo\nthree\u000bfour\ffive\rsix  seven"
    val got = VecOps.rollingWinHashes(UTF8String.fromString(s), 2)
    val toks = Seq("one", "two", "three", "four", "five", "six", "seven")
    assert(got.numElements() == 6)
    toks.sliding(2).zipWithIndex.foreach { case (win, i) =>
      assert(got.getLong(i) ==
        VecOps.rollingHash64(UTF8String.fromString(win.mkString(" "))))
    }
  }

  test("cosine ∈ [-1,1], exactly 1 on self for nonzero vectors") {
    check(Prop.forAll(vecs, vecs) { (v, w) =>
      val self = VecOps.cosineF(farr(v), farr(v))
      val cw = VecOps.cosineF(farr(v), farr(w))
      (v.forall(_ == 0f) || math.abs(self - 1.0) < 1e-9) &&
        cw >= -1.0 - 1e-9 && cw <= 1.0 + 1e-9
    })
  }

  test("simhash hamming is 0 on self and ≤ 64 always") {
    check(Prop.forAll(tokens, tokens) { (x, y) =>
      val a = VecOps.simhash64(arr(x))
      val d = java.lang.Long.bitCount(a ^ VecOps.simhash64(arr(y)))
      java.lang.Long.bitCount(a ^ VecOps.simhash64(arr(x))) == 0 &&
        d >= 0 && d <= 64
    })
  }

  test("rolling hash: prefix property h(s ++ c) = h(s)*B + c") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableChar) {
      (s, c) =>
        val h = VecOps.rollingHash64(UTF8String.fromString(s))
        val h2 = VecOps.rollingHash64(UTF8String.fromString(s + c))
        h2 == h * 1000003L + c.toInt
    })
  }

  test("word shingles: distinct, each shingle has n tokens, count ≤ len-n+1") {
    check(Prop.forAll(tokens) { x =>
      val sh = VecOps.wordShingles(arr(x), 3)
      val out = (0 until sh.numElements()).map(sh.getUTF8String(_).toString)
      out.distinct.size == out.size &&
        out.size <= math.max(0, x.size - 2) &&
        out.forall(_.split(" ", -1).length == 3)
    })
  }

  test("rhp signatures: deterministic and bit-bounded") {
    check(Prop.forAll(vecs) { v =>
      val a = VecOps.rhpSigs(farr(v), 8, 4)
      val b = VecOps.rhpSigs(farr(v), 8, 4)
      a.toSeq == b.toSeq && a.length == 4 &&
        a.forall(sig => sig >= 0 && sig < 256)
    })
  }

  test("zValue: interleave is order-isolating and roundtrips both dims") {
    def extract(z: Long, odd: Boolean): Long = {
      var out = 0L
      (0 until 32).foreach { i =>
        out |= ((z >> (2 * i + (if (odd) 1 else 0))) & 1L) << i
      }
      out
    }
    check(Prop.forAll(
      Gen.chooseNum(0L, 0xFFFFFFFFL), Gen.chooseNum(0L, 0xFFFFFFFFL)) {
      (a, b) =>
        val z = VecOps.zValue(a, b)
        extract(z, odd = false) == a && extract(z, odd = true) == b
    })
  }

  test("charEntropy: 0 ≤ H ≤ log2(distinct chars), permutation-invariant") {
    val strs = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd', 'x'))
    check(Prop.forAll(strs) { cs =>
      val s = cs.mkString
      val h = VecOps.charEntropy(UTF8String.fromString(s))
      val distinct = cs.distinct.size
      val hi = if (distinct == 0) 0.0
        else math.log(distinct.toDouble) / math.log(2.0)
      val hShuf = VecOps.charEntropy(
        UTF8String.fromString(scala.util.Random.shuffle(cs).mkString))
      h >= 0.0 && h <= hi + 1e-9 && math.abs(h - hShuf) < 1e-9
    })
  }

  // The two newest kernels live as SQL expressions; these properties
  // run on the pure-Scala replays that the operator specs pin
  // bit-exactly against the production expressions on real data
  // (CorpusQualitySpec / AnnSpec), so they transfer.

  private def qcWeight(tok: String): Long = {
    import graft.text.CorpusQuality.{QcDim, QcMult, QcMod, QcHalf}
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 4)
    (java.lang.Long.parseLong(hex, 16) % QcDim) * QcMult % QcMod - QcHalf
  }

  test("qc weight lattice: bounded, deterministic, both signs reachable") {
    import graft.text.CorpusQuality.QcHalf
    val toks = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    check(Prop.forAll(toks) { ts =>
      ts.forall { t =>
        val w = qcWeight(t)
        w >= -QcHalf && w <= QcHalf && w == qcWeight(t)
      }
    })
    // a degenerate lattice (all-one-sign) would make the gate constant
    val ws = (0 until 1024).map(b =>
      (b.toLong * graft.text.CorpusQuality.QcMult) %
        graft.text.CorpusQuality.QcMod - QcHalf)
    assert(ws.exists(_ > 0) && ws.exists(_ < 0))
  }

  private def bqPack(v: Seq[Float]): (Long, Long) = {
    val lo = v.take(32).zipWithIndex
      .collect { case (x, i) if x > 0 => 1L << i }.sum
    val hi = v.drop(32).zipWithIndex
      .collect { case (x, i) if x > 0 => 1L << i }.sum
    (lo, hi)
  }

  private def bqHamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) +
      java.lang.Long.bitCount(a._2 ^ b._2)

  test("bq packing: u32 words, hamming metric, single-sign-flip = 1") {
    val vec64 = Gen.listOfN(64, Gen.chooseNum(-5f, 5f))
    check(Prop.forAll(vec64, vec64, Gen.chooseNum(0, 63)) { (v, w, i) =>
      val (pl, ph) = bqPack(v)
      val hSelf = bqHamming((pl, ph), (pl, ph))
      val hvw = bqHamming((pl, ph), bqPack(w))
      // flip exactly dimension i's sign (avoid 0: sign(0) is 'not > 0')
      val flipped = v.updated(i, if (v(i) > 0) -1f else 1f)
      val hFlip = bqHamming((pl, ph), bqPack(flipped))
      pl >= 0 && pl < (1L << 32) && ph >= 0 && ph < (1L << 32) &&
        hSelf == 0 && hvw >= 0 && hvw <= 64 &&
        hvw == bqHamming(bqPack(w), (pl, ph)) &&
        hFlip == 1
    })
  }
}
