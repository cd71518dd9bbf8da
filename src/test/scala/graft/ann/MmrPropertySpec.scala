package graft.ann

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (raw ScalaCheck, no Spark) for the pure MMR greedy
  * kernel shared by `ann_mmr` and `hybrid_mmr`. The key check
  * recomputes every step's scores FROM SCRATCH from the sim table —
  * an independent oracle for the kernel's incremental `msim`
  * maintenance, which is exactly where an aggregation bug would hide.
  */
class MmrPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  /** (candidates with distinct cids 0..n-1, symmetric sim table). */
  private val instance: Gen[(Array[(Long, Long)],
      Map[(Long, Long), Long])] = for {
    n <- Gen.chooseNum(1, 25)
    rels <- Gen.listOfN(n, Gen.chooseNum(0L, 1000000L))
    simsUpper <- Gen.listOfN(n * (n - 1) / 2,
      Gen.chooseNum(-1000000L, 1000000L))
  } yield {
    val cands = rels.zipWithIndex.map { case (r, i) => (i.toLong, r) }
    val pairs = for {
      i <- 0 until n; j <- (i + 1) until n
    } yield (i.toLong, j.toLong)
    val sim = pairs.zip(simsUpper).flatMap { case ((a, b), s) =>
      Seq((a, b) -> s, (b, a) -> s)
    }.toMap
    (cands.toArray, sim)
  }

  /** From-scratch score of candidate `cid` against the pick prefix. */
  private def score(cid: Long, relU: Long, prefix: Seq[Long],
      sim: Map[(Long, Long), Long]): Long =
    if (prefix.isEmpty) 7L * relU
    else 7L * relU - 3L * prefix.map(p => sim((cid, p))).max

  test("selection size, membership, distinctness") {
    check(Prop.forAll(instance) { case (cands, sim) =>
      val sel = Ann.mmrSelect(cands, sim)
      val ids = sel.map(_._1)
      sel.length == math.min(Ann.MmrK, cands.length) &&
        ids.distinct.length == ids.length &&
        ids.forall(cands.map(_._1).contains)
    })
  }

  test("every step is greedy-optimal against FROM-SCRATCH scores, " +
      "ties to the lowest cid, reported score exact") {
    check(Prop.forAll(instance) { case (cands, sim) =>
      val rel = cands.toMap
      val sel = Ann.mmrSelect(cands, sim)
      sel.zipWithIndex.forall { case ((pick, reported), t) =>
        val prefix = sel.take(t).map(_._1)
        val sPick = score(pick, rel(pick), prefix, sim)
        val unpicked = cands.map(_._1)
          .filterNot(sel.take(t + 1).map(_._1).contains)
        reported == sPick && unpicked.forall { c =>
          val sc = score(c, rel(c), prefix, sim)
          sPick > sc || (sPick == sc && pick < c)
        }
      }
    })
  }

  test("input order never changes the selection") {
    check(Prop.forAll(instance, Gen.long) { case ((cands, sim), seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(cands.toSeq)
      Ann.mmrSelect(shuffled.toArray, sim) == Ann.mmrSelect(cands, sim)
    })
  }

  test("first pick maximizes pure relevance with the min-cid tiebreak") {
    check(Prop.forAll(instance) { case (cands, sim) =>
      val best = cands.maxBy { case (cid, r) => (r, -cid) }
      Ann.mmrSelect(cands, sim).head._1 == best._1
    })
  }
}
