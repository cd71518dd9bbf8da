package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions._

class ExpressionsSpec extends SparkSpec {

  test("cosine_sim: known values, zero norm, codegen = eval") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 1f), Array(-1f, -1f), -1.0),
      (Array(0f, 0f), Array(1f, 2f), 0.0) // zero norm -> 0, not NaN
    ).toDF("a", "b", "want")
    val got = df.select(cosineSim(col("a"), col("b")).as("c"), col("want"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("permute_f: gathers exactly the array(getItem…) spelling, " +
      "codegen = eval (r16 — the 64 KB-method fix for ann_pq_balanced)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val perm = rnd.shuffle((0 until 64).toVector).toArray
    val df = (0 until 50).map(_ => Array.fill(64)(rnd.nextFloat()))
      .toDF("v")
    val rows = df.select(
        permuteF(col("v"), perm).as("k"),
        array(perm.map(d => col("v").getItem(d)).toIndexedSeq: _*).as("lit"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Float](0) == r.getSeq[Float](1))
    }
    // structural equality: two independently wrapped copies of the
    // same permutation are the same case class (the MatVecF
    // IndexedSeq rule), so canonicalization/CSE can merge them
    val wrap = (a: Array[Int]) => PermuteF(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a))
    assert(wrap(perm.clone()) == wrap(perm.clone()))
  }

  test("dot_f + hoisted norms is bit-identical to fused cosine_sim") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 200).map { _ =>
      (Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("a", "b")
    val rows = df.select(
      cosineSim(col("a"), col("b")).as("fused"),
      (dotF(col("a"), col("b")) /
        (sqrt(dotF(col("a"), col("a"))) * sqrt(dotF(col("b"), col("b")))))
        .as("factored"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"${r.getDouble(0)} != ${r.getDouble(1)}"))
  }

  test("char_entropy: known distributions, null propagates") {
    import spark.implicits._
    val rows = Seq("aaaa", "ab", "abcd", "aabb", "").toDF("s")
      .select(charEntropy(col("s")).as("h"))
      .collect().map(_.getDouble(0))
    assert(rows(0) == 0.0)            // one symbol → 0 bits
    assert(math.abs(rows(1) - 1.0) < 1e-12) // two equiprobable → 1 bit
    assert(math.abs(rows(2) - 2.0) < 1e-12) // four equiprobable → 2 bits
    assert(math.abs(rows(3) - 1.0) < 1e-12) // order-invariant
    assert(rows(4) == 0.0)            // empty string → 0
    val n = Seq(Option.empty[String]).toDF("s")
      .select(charEntropy(col("s")).as("h")).collect()
    assert(n(0).isNullAt(0))
  }

  test("minhash_sig: deterministic, jaccard-correlated") {
    import spark.implicits._
    val a = (1 to 60).map(i => s"sh$i")
    val b = (1 to 54).map(i => s"sh$i") ++ (100 to 105).map(i => s"sh$i") // j=0.82
    val c = (200 to 260).map(i => s"sh$i") // disjoint from a
    val df = Seq(("a", a), ("b", b), ("c", c)).toDF("id", "sh")
      .select(col("id"), minhashSig(col("sh"), 128).as("sig"))
    val sigs = df.collect().map(r =>
      r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("a").size == 128)
    def est(x: Seq[Long], y: Seq[Long]) =
      x.zip(y).count { case (u, v) => u == v } / 128.0
    assert(est(sigs("a"), sigs("a")) == 1.0)
    assert(math.abs(est(sigs("a"), sigs("b")) - 0.82) < 0.15)
    assert(est(sigs("a"), sigs("c")) < 0.1)
  }

  test("simhash64: identical inputs agree, near inputs near, far inputs far") {
    import spark.implicits._
    val base = (1 to 80).map(i => s"w$i")
    val near = base.updated(3, "CHANGED")
    val far = (300 to 380).map(i => s"w$i")
    val df = Seq(("base", base), ("same", base), ("near", near), ("far", far))
      .toDF("id", "toks")
      .select(col("id"), simhash64(col("toks")).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(m("base") == m("same"))
    assert(ham(m("base"), m("near")) <= 10)
    assert(ham(m("base"), m("far")) >= 20)
  }

  test("jaccard_sim: exact distinct-set semantics") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c", "a"), Seq("b", "c", "d")))
      .toDF("x", "y")
      .select(jaccardSim(col("x"), col("y")).as("j"))
    // {a,b,c} vs {b,c,d}: 2/4
    assert(df.head().getDouble(0) == 0.5)
  }

  test("rhp_sigs: deterministic, sign-flip moves buckets") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => (i % 7 - 3).toFloat)
    val neg = v.map(x => -x)
    val df = Seq(("v", v), ("v2", v), ("neg", neg)).toDF("id", "e")
      .select(col("id"), rhpSigs(col("e"), 8, 4).as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("v") == m("v2"))
    assert(m("v").size == 4)
    // all 8 bits flip for the negated vector in every table
    m("v").zip(m("neg")).foreach { case (a, b) =>
      assert((a ^ b) == 255L, s"expected full flip, got $a vs $b")
    }
  }

  test("vector_avg: element-wise mean with mergeable partials") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 2f)), (1L, Array(3f, 6f)),
      (2L, Array(10f, 20f))
    ).toDF("k", "v").repartition(4) // force partial/merge path
    val m = df.groupBy(col("k"))
      .agg(VectorAvg.vectorAvg(col("v")).as("m"))
      .as[(Long, Array[Float])].collect().toMap
    assert(m(1L).toSeq == Seq(2f, 4f))
    assert(m(2L).toSeq == Seq(10f, 20f))
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val df = Seq((Option.empty[Seq[String]], Seq("a")))
      .toDF("x", "y")
      .select(jaccardSim(col("x"), col("y")).as("j"),
        simhash64(col("x")).as("s"))
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL function registration (registerSql path)") {
    GraftExtensions.registerSql(spark)
    locally {
      val r = spark.sql(
        """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) c,
          |  jaccard_sim(array('a','b'), array('b','c')) j,
          |  simhash64(array('x','y')) s,
          |  size(minhash_sig(array('x','y'), 16)) k,
          |  size(rhp_sigs(array(1.0F, 2.0F), 8, 4)) t
          |""".stripMargin).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-12)
      assert(r.getInt(3) == 16)
      assert(r.getInt(4) == 4)
    }
    locally {
      val r = spark.sql(
        """SELECT rolling_hash64('ab') h,
          |  rolling_win_hashes('a b c', 2) ws,
          |  word_shingles(array('a','b','c'), 2) sh
          |""".stripMargin).head()
      assert(r.getLong(0) == 'a'.toLong * 1000003L + 'b'.toLong)
      // window hashes equal rolling_hash64 of each joined window
      assert(r.getSeq[Long](1) == Seq(
        VecOps.rollingHash64(
          org.apache.spark.unsafe.types.UTF8String.fromString("a b")),
        VecOps.rollingHash64(
          org.apache.spark.unsafe.types.UTF8String.fromString("b c"))))
      assert(r.getSeq[String](2) == Seq("a b", "b c"))
    }
  }
}
