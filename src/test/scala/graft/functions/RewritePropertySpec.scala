package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for algorithm-level invariants that a single
  * example-based spec can't pin: the BPE boundary-anchored rewrite
  * formula (shared verbatim by the Spark expression and the DuckDB
  * oracle in CorpusQuality), the Misra-Gries superset guarantee that
  * `heavy_hitters` correctness rests on, and the xlsx write→read
  * round-trip under adversarial strings.
  */
class RewritePropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  // ---- BPE rewrite formula (CorpusQuality.bpeTrain + bpeRoundOracle)

  /** The exact string formula both engines execute. */
  private def formulaRewrite(seq: String, a: String, b: String): String =
    (" " + seq.replace(" ", "  ") + " ")
      .replace(s" $a  $b ", s" ${a + b} ")
      .replace("  ", " ").trim

  /** Reference BPE: left-to-right greedy merge over the symbol list. */
  private def referenceMerge(syms: List[String], a: String,
      b: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  // multi-char symbols included on purpose: 'ax' followed by 'y' is
  // the cross-boundary false-merge case the formula must NOT hit
  private val symGen =
    Gen.oneOf("a", "b", "x", "y", "ax", "xy", "ab", "ba", "xyx")

  test("BPE rewrite formula == reference left-to-right merge") {
    check(Prop.forAll(Gen.listOf(symGen), symGen, symGen) { (syms, a, b) =>
      formulaRewrite(syms.mkString(" "), a, b) ==
        referenceMerge(syms, a, b).mkString(" ")
    })
  }

  // ---- Misra-Gries superset guarantee (heavy_hitters' pass 1)

  test("misra_gries: merged partials keep every item with freq > N/(k+1)") {
    val itemsGen = Gen.listOf(Gen.oneOf(
      "hot", "hot", "hot", "warm", "warm", "t1", "t2", "t3", "t4", "t5"))
    val kGen = Gen.chooseNum(2, 8)
    check(Prop.forAll(itemsGen, kGen, Gen.chooseNum(1, 4)) {
      (items, k, nParts) =>
        val mg = MisraGries(BoundReference(0, StringType, nullable = true), k)
        // simulate map partitions + tree merge, like a real shuffle
        val bufs = items.grouped(math.max(1, items.size / nParts)).map { p =>
          val b = mg.createAggregationBuffer()
          p.foreach(s => mg.update(b, InternalRow(UTF8String.fromString(s))))
          b
        }.toList
        val merged = bufs match {
          case Nil => mg.createAggregationBuffer()
          case h :: t => t.foldLeft(h)(mg.merge)
        }
        val n = items.size
        val trueCounts = items.groupBy(identity).view.mapValues(_.size)
        trueCounts.forall { case (item, c) =>
          c * (k + 1) <= n || merged.contains(item)
        }
    })
  }

  // ---- xlsx write→read round-trip under adversarial strings

  private val cellChar = Gen.frequency(
    (8, Gen.alphaNumChar),
    (3, Gen.oneOf('<', '>', '&', '"', '\'', ' ', 'ä', 'ß', '€', '中')),
    (1, Gen.oneOf('\n', '\t')))
  private val cellStr = Gen.listOf(cellChar).map(_.mkString)

  test("xlsx: string cells round-trip exactly (escaping, unicode, nulls)") {
    check(Prop.forAll(Gen.listOf(Gen.option(cellStr))) { col =>
      val header = Seq("s", "n")
      val rows = col.zipWithIndex.map { case (v, i) =>
        IndexedSeq[Any](v.orNull, i.toLong)
      }
      val path = java.nio.file.Files
        .createTempFile("prop", ".xlsx").toString
      try {
        graft.etl.XlsxSink.writeValues(header, rows, path, _ => false)
        val raw = graft.etl.XlsxRead.readRaw(path)
        raw.header == header.toIndexedSeq &&
          raw.rows.size == rows.size &&
          raw.rows.zip(rows).forall { case (got, want) =>
            got(0) == want(0) && got(1) == want(1).toString
          }
      } finally java.nio.file.Files.delete(java.nio.file.Paths.get(path))
    })
  }
}
