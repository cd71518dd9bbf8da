package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r13 two-level coarse quantizer (super-cell candidate pruning
  * for per-vector cell search — [[Ann.superCentroids]] /
  * [[Ann.superCellCandidates]] / [[Ann.assignCellsGated]]).
  *
  * Every oracled run stays below [[Ann.TwoLevelMinCells]] and takes
  * the exact flat argmax, so these specs are the correctness gate for
  * the pruned arm: determinism, full coverage, exactness whenever the
  * probe set covers all supers, and a pinned agreement floor vs the
  * flat argmax when it does not.
  */
class AnnTwoLevelSpec extends SparkSpec {

  private val Dim = 64

  /** Deterministic pseudo-random unit-ish vector (StrictMath — bit
    * stable across JVMs/hosts).
    */
  private def vec(seed: Long): Array[Float] =
    Array.tabulate(Dim)(d => StrictMath.sin(seed * 37.0 + d * 1.31).toFloat)

  private def cellSet(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map(i => (i.toLong * 3 + 1, vec(1000 + i)))

  test("superCentroids: ⌈√cells⌉ supers, every cell mapped, " +
      "deterministic across calls") {
    val cells = cellSet(40)
    val (sup1, map1) = Ann.superCentroids(cells)
    val (sup2, map2) = Ann.superCentroids(scala.util.Random.shuffle(cells))
    assert(sup1.length == math.ceil(math.sqrt(40.0)).toInt) // 7
    assert(map1.keySet == cells.map(_._1).toSet)
    assert(map1.values.forall(s => s >= 0 && s < sup1.length))
    // input order must not matter (the kernel sorts by cell_id)
    assert(map1 == map2)
    assert(sup1.zip(sup2).forall { case (a, b) => a.sameElements(b) })
  }

  test("two-level assignment is EXACT when SuperProbes covers all " +
      "supers (candidate set complete ⇒ same argmax as flat)") {
    import spark.implicits._
    // 9 cells → 3 supers = SuperProbes → every cell is a candidate
    val cents = cellSet(9).toDF("cell_id", "c_emb")
    val vecs = (0 until 200).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val flat = Ann.assignCellsGated(vecs, cents, twoLevelMin = Long.MaxValue)
      .select(col("vec_id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Ann.assignCellsGated(vecs, cents, twoLevelMin = 1)
      .select(col("vec_id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == flat)
  }

  test("two-level assignment agreement floor vs flat argmax when " +
      "probing a strict super subset") {
    import spark.implicits._
    // 64 cells → 8 supers, 3 probed: the nearest cell can be missed
    // only when its super misses the vector's top-3 — pin the floor
    val cents = cellSet(64).toDF("cell_id", "c_emb")
    val vecs = (0 until 400).map(i => (i.toLong, vec(i * 7 + 3)))
      .toDF("vec_id", "embedding")
    val flat = Ann.assignCellsGated(vecs, cents, twoLevelMin = Long.MaxValue)
      .select(col("vec_id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Ann.assignCellsGated(vecs, cents, twoLevelMin = 1)
      .select(col("vec_id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two.keySet == flat.keySet, "every vector must be assigned")
    val agree = flat.count { case (v, c) => two(v) == c }
    assert(agree >= (flat.size * 0.8).toInt,
      s"agreement $agree/${flat.size} below the 80% floor")
  }

  test("superCellCandidates: per-vector candidates are exactly the " +
      "probed supers' member cells, selection plans on TopKExec") {
    import spark.implicits._
    val cells = cellSet(25) // 5 supers, 3 probed
    val cents = cells.toDF("cell_id", "c_emb")
    val vecs = (0 until 50).map(i => (i.toLong, vec(i + 77)))
      .toDF("vec_id", "embedding")
    val cand = Ann.superCellCandidates(vecs, cents)
    val p = cand.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.sliding("TopK (".length).count(_ == "TopK (") >= 2,
      s"super selection must be partial+final TopKExec:\n$p")
    assert(!p.contains(" Window "), "no rank window in the pruned arm")
    val perVec = cand.groupBy(col("vec_id"))
      .agg(countDistinct(col("cell_id")).as("nc"))
      .select(min(col("nc")), max(col("nc"))).head()
    val (_, cellSup) = Ann.superCentroids(cells)
    val supSizes = cellSup.groupBy(_._2).view.mapValues(_.size)
    val maxCand = supSizes.values.toSeq.sorted.reverse
      .take(Ann.SuperProbes).sum
    assert(perVec.getLong(1) <= maxCand,
      "candidates exceed the largest 3 supers' membership")
    assert(perVec.getLong(0) >= 1, "every vector needs ≥1 candidate cell")
  }

  test("empty supers are excluded from probing (r14 ADVICE): forced " +
      "empty supers lose no vector and candidates stay member-backed") {
    import spark.implicits._
    // 25 IDENTICAL cells: every cell k-means-assigns to super 0 (ties
    // break to the lowest super id), so supers 1–4 end EMPTY with
    // their seed embeddings kept. Pre-fix those seeds sat in the
    // probe table; a probed empty super contributes zero candidate
    // cells. The fix probes member-bearing supers only, making ≥1
    // candidate per probed super structural.
    val cells = (0 until 25).map(i => (i.toLong, vec(42)))
    val (_, cellSup) = Ann.superCentroids(cells)
    assert(cellSup.values.toSet == Set(0),
      "construction must leave supers 1–4 empty")
    val cents = cells.toDF("cell_id", "c_emb")
    val vecs = (0 until 60).map(i => (i.toLong, vec(i + 5)))
      .toDF("vec_id", "embedding")
    val cand = Ann.superCellCandidates(vecs, cents)
    assert(cand.select(col("vec_id")).distinct().count() == 60,
      "no vector may drop out when its top supers would be empty")
    val assigned = Ann.assignCellsGated(vecs, cents, twoLevelMin = 1)
    assert(assigned.count() == 60, "assignment must cover every vector")
  }

  test("probeCellsGated (r14): two-level arm equals the flat arm when " +
      "SuperProbes covers all supers, and keeps the per-query probe " +
      "bounds on a strict subset") {
    import spark.implicits._
    def probeSet(qs: org.apache.spark.sql.DataFrame,
        cs: org.apache.spark.sql.DataFrame, gate: Long) =
      Ann.probeCellsGated(qs, cs, gate)
        .select(col("q_id"), col("cell_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 9 cells → 3 supers = SuperProbes → candidate set complete →
    // probed cells identical to the flat arm
    val cents9 = cellSet(9).toDF("cell_id", "c_emb")
    val qs = (0 until 40).map(i => (i.toLong, vec(i * 11 + 2)))
      .toDF("q_id", "q_emb")
    assert(probeSet(qs, cents9, 1L) ==
      probeSet(qs, cents9, Long.MaxValue))
    // 64 cells → 8 supers, 3 probed: bounds still hold per query —
    // at least IvfProbes (floor) when candidates allow, never more
    // than IvfMaxProbes; every query keeps ≥ 1 probed cell
    val cents64 = cellSet(64).toDF("cell_id", "c_emb")
    // plan pin: the forced arm routes through the super selection's
    // bounded heap, never a per-query rank over ALL cells
    val p = Ann.probeCellsGated(qs, cents64, 1L).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("TopK ("),
      s"two-level probe must plan the super TopK:\n$p")
    val byQ = Ann.probeCellsGated(qs, cents64, 1L)
      .groupBy(col("q_id")).agg(countDistinct(col("cell_id")).as("nc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byQ.size == 40, "every query must keep probed cells")
    assert(byQ.values.forall(n => n >= 1 && n <= Ann.IvfMaxProbes),
      s"probe counts out of bounds: ${byQ.values.toSeq.sorted}")
    // extra per-query state must ride through the pruned arm untouched
    // — INCLUDING columns named vn/cn, which clashed with the helper
    // names before r15 renamed the internals to __vn/__cn
    val withState = qs.withColumn("qn", lit(1.0))
      .withColumn("vn", lit(2.0)).withColumn("cn", lit(3.0))
    val out = Ann.probeCellsGated(withState, cents64, 1L)
    val cols = out.columns.toSeq
    assert(cols == (withState.columns.toSeq :+ "cell_id" :+ "qc_dot"),
      s"column contract drifted: $cols")
    val vncn = out.select(col("vn"), col("cn")).distinct().collect()
    assert(vncn.length == 1 && vncn(0).getDouble(0) == 2.0 &&
      vncn(0).getDouble(1) == 3.0,
      "caller state named vn/cn must survive with its values intact")
    // hoisted-count arm: a caller-supplied count gates identically
    assert(probeSet(qs, cents64, 1L) ==
      Ann.probeCellsGated(qs, cents64, 1L, knownCells = Some(64L))
        .select(col("q_id"), col("cell_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
