package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** E28 `ann_opq` — PQ/ADC over a LEARNED rotation (the rotation arm of
  * Ge et al.'s Optimized Product Quantization, complementing E25's
  * permutation arm): before the E8 codebooks train, the coordinate
  * frame is rotated by a chain of [[AnnOpq.OpqRots]] Givens rotations
  * chosen by the classical Jacobi pivot rule — each step zeroes the
  * largest remaining off-diagonal covariance entry — followed by
  * OPQ's eigenvalue-allocation step ([[AnnOpq.allocPerm]]): the
  * rotated dimensions, whose variances the chain concentrates, are
  * dealt round-robin by variance into the subspaces. Decorrelated
  * dimensions are what product quantizers want: PQ assumes subspaces
  * are independent, and cross-subspace covariance is exactly the
  * structure a contiguous (or permuted) split cannot remove but a
  * rotation can. On the sf corpus the rotation arm beats the
  * un-rotated E8 baseline by 8 recall points (spec-pinned as
  * recall > plain PQ).
  *
  * The 100 TB shape is [[EmbPca]]'s: ONE distributed pass accumulates
  * the exact integer second-moment matrix (gram_upper + per-dim sums,
  * mergeable O(d²) partials), the O(d²) Jacobi sweep runs on the
  * driver — the right place for a 64×64 problem — and the corpus is
  * touched again only to rotate (map-only against 64×64 broadcast
  * literals) and to train/encode exactly as E8. At rest the index
  * stores [[Ann.PqM]] bytes per vector plus the 64×64 float rotation
  * sidecar.
  *
  * Cross-engine exactness (the E14 float-sync recipe): covariance
  * entries derive elementwise from exact integers; every Givens step
  * picks its pivot on the 6-dp-rounded |c| with (i, j) tiebreak,
  * computes the annihilating angle with textually-mirrored IEEE
  * expressions, and float-casts every touched covariance/rotation
  * entry — so the DuckDB replay walks through the identical rotation
  * chain, bit for bit. Rotated coordinates float-sync per component
  * (the rotated corpus is a REAL[] both sides), then the whole E8
  * Lloyd/encode/ADC replay applies verbatim. The exact re-rank scores
  * ORIGINAL vectors — an orthogonal rotation applied to both sides
  * preserves dot products, so E8's rerank contract is unchanged.
  */
object AnnOpq {

  val Dim = Ann.Dim
  val OpqRots = 48 // Givens steps, unrolled in the oracle

  /** Covariance of the micro-unit-quantized corpus from ONE exact
    * integer pass (gram upper triangle + per-dimension sums — the
    * [[EmbPca]] accumulator): entries are identical on any engine or
    * partitioning because every input to the elementwise double
    * arithmetic is an exact integer.
    */
  private[ann] def covariance(c: DataFrame): Array[Array[Double]] = {
    val withQ = c.withColumn("q", expr(
      "transform(embedding, x -> cast(floor(cast(x as double) * 1e6) as bigint))"))
    val aggs =
      graft.functions.GramUpper.gramUpper(col("embedding")).as("g") +:
      count(lit(1)).as("n") +:
      (0 until Dim).map(i => sum(col("q").getItem(i)).as(s"s$i"))
    val gRow = withQ.agg(aggs.head, aggs.tail: _*).collect()(0)
    val g = gRow.getSeq[Long](0)
    val n = gRow.getLong(1)
    require(g.length == Dim * (Dim + 1) / 2,
      s"ann_opq: expected dim $Dim, got gram of ${g.length}")
    val s = (0 until Dim).map(i => gRow.getAs[Long](s"s$i"))
    val cm = Array.ofDim[Double](Dim, Dim)
    var k = 0
    for (i <- 0 until Dim; j <- i until Dim) {
      val cij = (g(k).toDouble - s(i).toDouble * s(j).toDouble / n) / n
      cm(i)(j) = cij
      cm(j)(i) = cij
      k += 1
    }
    cm
  }

  /** [[OpqRots]] Jacobi-pivoted Givens steps over a covariance copy:
    * returns (rotation R as R[i][j], final rotated covariance). Every
    * touched entry float-syncs so the oracle's unrolled replay stays
    * bit-identical; the pivot ranks on HALF_UP-rounded |c| (DuckDB's
    * round is half-away-from-zero — same thing on the non-negative
    * |c|) with (i, j) ascending ties.
    */
  private[ann] def givensChain(cm0: Array[Array[Double]])
      : (Array[Array[Double]], Array[Array[Double]]) = {
    def fs(x: Double): Double = x.toFloat.toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cm = cm0.map(_.clone())
    val r = Array.tabulate(Dim, Dim)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to OpqRots) {
      var bp = 0; var bq = 1; var bk = -1.0
      for (i <- 0 until Dim; j <- i + 1 until Dim) {
        val key = r6(math.abs(cm(i)(j)))
        if (key > bk) { bk = key; bp = i; bq = j }
      }
      val cpp = cm(bp)(bp); val cqq = cm(bq)(bq); val cpq = cm(bp)(bq)
      val (gc, gs) =
        if (cpq == 0.0) (1.0, 0.0)
        else {
          val theta = (cqq - cpp) / (2.0 * cpq)
          val t = (if (theta >= 0.0) 1.0 else -1.0) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          (fs(1.0 / math.sqrt(t * t + 1.0)),
            fs(t / math.sqrt(t * t + 1.0)))
        }
      for (k <- 0 until Dim if k != bp && k != bq) {
        val ckp = cm(k)(bp); val ckq = cm(k)(bq)
        val np = fs(gc * ckp - gs * ckq)
        val nq = fs(gs * ckp + gc * ckq)
        cm(k)(bp) = np; cm(bp)(k) = np
        cm(k)(bq) = nq; cm(bq)(k) = nq
      }
      val npp = fs(gc * gc * cpp - 2.0 * gc * gs * cpq + gs * gs * cqq)
      val nqq = fs(gs * gs * cpp + 2.0 * gc * gs * cpq + gc * gc * cqq)
      cm(bp)(bp) = npp; cm(bq)(bq) = nqq
      cm(bp)(bq) = 0.0; cm(bq)(bp) = 0.0
      for (k <- 0 until Dim) {
        val rkp = r(k)(bp); val rkq = r(k)(bq)
        r(k)(bp) = fs(gc * rkp - gs * rkq)
        r(k)(bq) = fs(gs * rkp + gc * rkq)
      }
    }
    (r, cm)
  }

  private[ann] def learnedRotation(c: DataFrame): Array[Array[Double]] =
    givensChain(covariance(c))._1

  /** Rotated coordinates y = Rᵀx, one float-synced component per
    * output dimension: index-ordered double accumulation then a REAL
    * cast — `CAST(list_dot_product(…) AS REAL)` replays it exactly.
    * Runs as the [[graft.functions.MatVecF]] codegen kernel: one
    * static call per row. (Both a transform/aggregate lambda chain and
    * a 4096-node literal expression tree evaluate interpreted at
    * milliseconds per row — 100× the whole query.)
    */
  private def rotateCol(v: Column, rtFlat: Array[Double]): Column =
    graft.functions.GraftFunctions.matVecF(v, rtFlat, Dim)

  /** Flatten a row-per-output rotation ONCE — every rotate column built
    * from the same flat array is structurally equal (MatVecF holds an
    * IndexedSeq), so sample/corpus/query rotations canonicalize
    * together instead of defeating subexpression elimination. */
  private def flatRot(rt: Seq[Seq[Double]]): Array[Double] =
    rt.flatten.toArray

  /** OPQ's eigenvalue-allocation step on the ROTATED frame: rank the
    * rotated dimensions by their (partially concentrated) variance —
    * the diagonal of the final covariance the Givens chain already
    * computed — and deal them round-robin into the [[Ann.PqM]]
    * subspaces, subspace-major (E25's allocation law over E28's
    * coordinates). A permutation of an orthogonal frame is still
    * orthogonal, so the rerank contract is untouched.
    */
  private[ann] def allocPerm(cmf: Array[Array[Double]]): Seq[Int] = {
    val ranked = (0 until Dim).map(i => (cmf(i)(i), i))
      .sortBy { case (v, i) => (-v, i) }.map(_._2)
    (0 until Ann.PqM).flatMap(s =>
      ranked.zipWithIndex.collect {
        case (d, r) if r % Ann.PqM == s => d
      })
  }

  def annOpq(spark: SparkSession, dir: String): DataFrame =
    annOpqOf(graft.Tables(spark, dir, "embeddings"))

  /** [[annOpq]]'s kernel on caller embeddings frame. */
  def annOpqOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import Ann.{PqM, PqK, QuantRerank}
    val cUn = Ann.corpusOf(emb)
    val (rot, cmf) = givensChain(covariance(cUn))
    val perm = allocPerm(cmf)
    // COMPOSE the allocation permutation into the rotation literal —
    // rtP(j) = column perm(j) of R, so p_emb_j = x · R[,perm(j)] in one
    // projection. (A separate permute(rotate(x)) column pair is a trap:
    // CollapseProject inlines the full 64-term rotate into EVERY
    // permuted element — a 64× expression blowup that turned the
    // corpus map into minutes of single-row work.)
    val rtP = flatRot((0 until Dim).map(j =>
      (0 until Dim).map(i => rot(i)(perm(j)))))
    def rotate(v: Column): Column = rotateCol(v, rtP)
    val sample = Ann.trainSample(spark, cUn)
      .select(col("vec_id"), rotate(col("embedding")).as("embedding"))
    val cb = Ann.pqTrainLocal(spark, sample)
    val c = Ann.corpusOf(emb, spread = true)
      .withColumn("p_emb", rotate(col("embedding")))
    val sv = Ann.subvecFrame(c, "p_emb", "vec_id")
    val enc = Ann.assignCodes(sv, cb)
      .groupBy(col("vec_id"))
      .agg(Ann.codesAgg.as("codes"))
      .join(c.withColumn("nrm", sqrt(dotF(col("embedding"), col("embedding"))))
        .select(col("vec_id"), col("embedding"), col("nrm")), Seq("vec_id"))
    val q = Ann.queriesOf(emb)
      .withColumn("p_emb", rotate(col("q_emb")))
      .withColumn("qn", sqrt(dotF(col("q_emb"), col("q_emb"))))
    val lut = Ann.subvecFrame(q, "p_emb", "q_id")
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d", dotF(col("sv"), col("cb_emb")))
      .groupBy(col("q_id"))
      .agg(Ann.adcLutAgg.as("lut"))
      .join(q.select(col("q_id"), col("q_emb"), col("qn")), Seq("q_id"))
    val cand = Ann.poolTopK(
      enc.crossJoin(broadcast(lut))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("adot", Ann.adcSum)
        .withColumn("adot_r", round(col("adot"), 6)),
      orderBy = Seq("adot_r" -> false, "vec_id" -> true), k = QuantRerank)
    Ann.topK(cand.withColumn("cos",
      when(col("nrm") * col("qn") === 0.0, 0.0)
        .otherwise(dotF(col("embedding"), col("q_emb")) /
          (col("nrm") * col("qn")))))
  }

  /** E29 `ann_ivfopq` — the E28 transform in front of the E11 index:
    * the full production ladder top (OPQ rotation + allocation →
    * IVF cell pruning → residual PQ codes → ADC → exact re-rank).
    * The entire E11 pipeline runs VERBATIM over the rotated corpus
    * (training sample ids are rotation-invariant — the draw keys on
    * vec_id — so the sample is the same vectors, rotated); queries
    * rotate identically, and the re-rank scores rotated vectors
    * against rotated queries, which is the same cosine up to float
    * rounding and exactly what the oracle replays.
    */
  def annIvfOpq(spark: SparkSession, dir: String): DataFrame =
    annIvfOpqOf(graft.Tables(spark, dir, "embeddings"))

  /** [[annIvfOpq]]'s kernel on caller embeddings frame. */
  def annIvfOpqOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    val cRaw = Ann.corpusOf(emb)
    val (rot, cmf) = givensChain(covariance(cRaw))
    val perm = allocPerm(cmf)
    val rtP = flatRot((0 until Dim).map(j =>
      (0 until Dim).map(i => rot(i)(perm(j)))))
    val cRot = cRaw.select(col("vec_id"),
      rotateCol(col("embedding"), rtP).as("embedding"))
    val qRot = cRot.filter(col("vec_id") < Ann.NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    Ann.ivfPqOver(spark, cRot, qRot)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_opq" -> (annOpq _),
    "ann_ivfopq" -> (annIvfOpq _)
  )

  // ------------------------------------------------------------ oracle

  /** One unrolled Givens step k: pivot pick, annihilating angle with
    * the same float-sync points as [[givensChain]], covariance and
    * rotation updates via self-joins on the touched rows/columns.
    */
  private def givensCte(k: Int): String = {
    val cv = s"cv${k - 1}"
    val rt = s"rt${k - 1}"
    s"""pv$k AS MATERIALIZED (SELECT i AS p, j AS q, c AS cpq FROM $cv
       |  WHERE i < j ORDER BY round(abs(c), 6) DESC, i, j LIMIT 1),
       |ang$k AS MATERIALIZED (SELECT p, q, cpq, cpp, cqq,
       |    CASE WHEN cpq = 0 THEN 1.0
       |      ELSE CAST(CAST(1.0 / sqrt(t * t + 1) AS REAL) AS DOUBLE)
       |      END AS gc,
       |    CASE WHEN cpq = 0 THEN 0.0
       |      ELSE CAST(CAST(t / sqrt(t * t + 1) AS REAL) AS DOUBLE)
       |      END AS gs
       |  FROM (SELECT p, q, cpq, cpp, cqq,
       |      CASE WHEN cpq = 0 THEN 0.0 ELSE
       |        (CASE WHEN (cqq - cpp) / (2.0 * cpq) >= 0 THEN 1.0
       |          ELSE -1.0 END)
       |        / (abs((cqq - cpp) / (2.0 * cpq))
       |          + sqrt((cqq - cpp) / (2.0 * cpq)
       |            * ((cqq - cpp) / (2.0 * cpq)) + 1.0)) END AS t
       |    FROM (SELECT v.p, v.q, v.cpq, dp.c AS cpp, dq.c AS cqq
       |      FROM pv$k v
       |      JOIN $cv dp ON dp.i = v.p AND dp.j = v.p
       |      JOIN $cv dq ON dq.i = v.q AND dq.j = v.q))),
       |cv$k AS MATERIALIZED (SELECT a.i, a.j,
       |    CASE
       |      WHEN (a.i = g.p AND a.j = g.q) OR (a.i = g.q AND a.j = g.p)
       |        THEN 0.0
       |      WHEN a.i = g.p AND a.j = g.p THEN CAST(CAST(
       |        g.gc * g.gc * g.cpp - 2.0 * g.gc * g.gs * g.cpq
       |          + g.gs * g.gs * g.cqq AS REAL) AS DOUBLE)
       |      WHEN a.i = g.q AND a.j = g.q THEN CAST(CAST(
       |        g.gs * g.gs * g.cpp + 2.0 * g.gc * g.gs * g.cpq
       |          + g.gc * g.gc * g.cqq AS REAL) AS DOUBLE)
       |      WHEN a.i = g.p THEN CAST(CAST(
       |        g.gc * yp.c - g.gs * yq.c AS REAL) AS DOUBLE)
       |      WHEN a.i = g.q THEN CAST(CAST(
       |        g.gs * yp.c + g.gc * yq.c AS REAL) AS DOUBLE)
       |      WHEN a.j = g.p THEN CAST(CAST(
       |        g.gc * xp.c - g.gs * xq.c AS REAL) AS DOUBLE)
       |      WHEN a.j = g.q THEN CAST(CAST(
       |        g.gs * xp.c + g.gc * xq.c AS REAL) AS DOUBLE)
       |      ELSE a.c END AS c
       |  FROM $cv a CROSS JOIN ang$k g
       |  LEFT JOIN $cv xp ON xp.i = a.i AND xp.j = g.p
       |  LEFT JOIN $cv xq ON xq.i = a.i AND xq.j = g.q
       |  LEFT JOIN $cv yp ON yp.i = a.j AND yp.j = g.p
       |  LEFT JOIN $cv yq ON yq.i = a.j AND yq.j = g.q),
       |rt$k AS MATERIALIZED (SELECT a.i, a.j,
       |    CASE
       |      WHEN a.j = g.p THEN CAST(CAST(
       |        g.gc * xp.r - g.gs * xq.r AS REAL) AS DOUBLE)
       |      WHEN a.j = g.q THEN CAST(CAST(
       |        g.gs * xp.r + g.gc * xq.r AS REAL) AS DOUBLE)
       |      ELSE a.r END AS r
       |  FROM $rt a CROSS JOIN ang$k g
       |  LEFT JOIN $rt xp ON xp.i = a.i AND xp.j = g.p
       |  LEFT JOIN $rt xq ON xq.i = a.i AND xq.j = g.q)""".stripMargin
  }

  /** The rotation + allocation replay (covariance from exact
    * integers → unrolled Givens chain → rotated, variance-allocated
    * coordinates `pe(vec_id, pemb)`), shared by both E28 oracles. No
    * leading WITH.
    */
  private[ann] def rotationCtes: String =
    s"""qv AS MATERIALIZED (SELECT vec_id,
       |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)
       |      for i in range(1, ${Dim + 1})] AS q
       |  FROM embeddings),
       |nn AS (SELECT count(*) AS n FROM qv),
       |gm AS (SELECT ii.i AS i, jj.j AS j, sum(q.q[ii.i] * q.q[jj.j]) AS g
       |  FROM qv q, range(1, ${Dim + 1}) ii(i), range(1, ${Dim + 1}) jj(j)
       |  WHERE jj.j >= ii.i GROUP BY ii.i, jj.j),
       |sm AS (SELECT ii.i AS i, sum(q.q[ii.i]) AS s
       |  FROM qv q, range(1, ${Dim + 1}) ii(i) GROUP BY ii.i),
       |cu AS (SELECT gm.i, gm.j,
       |    (CAST(gm.g AS DOUBLE)
       |      - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE) / nn.n) / nn.n
       |      AS c
       |  FROM gm JOIN sm si ON si.i = gm.i JOIN sm sj ON sj.i = gm.j
       |  CROSS JOIN nn),
       |cv0 AS MATERIALIZED (SELECT i, j, c FROM cu
       |  UNION ALL SELECT j AS i, i AS j, c FROM cu WHERE i <> j),
       |rt0 AS MATERIALIZED (SELECT ii.i, jj.j,
       |    CASE WHEN ii.i = jj.j THEN 1.0 ELSE 0.0 END AS r
       |  FROM range(1, ${Dim + 1}) ii(i), range(1, ${Dim + 1}) jj(j)),
       |${(1 to OpqRots).map(givensCte).mkString(",\n")},
       |rcols AS MATERIALIZED (SELECT j, array_agg(r ORDER BY i) AS rc
       |  FROM rt$OpqRots GROUP BY j),
       |pej AS (SELECT e.vec_id, rc.j,
       |    CAST(list_dot_product(CAST(e.embedding AS DOUBLE[]), rc.rc)
       |      AS REAL) AS y
       |  FROM embeddings e CROSS JOIN rcols rc),
       |yv AS MATERIALIZED (SELECT vec_id, array_agg(y ORDER BY j) AS yarr
       |  FROM pej GROUP BY vec_id),
       |vr AS (SELECT i, c AS vdiag FROM cv$OpqRots WHERE i = j),
       |rk AS (SELECT i, row_number() OVER (ORDER BY vdiag DESC, i) - 1
       |    AS rk
       |  FROM vr),
       |plist AS (SELECT list(i ORDER BY rk % ${Ann.PqM}, rk // ${Ann.PqM})
       |    AS pl
       |  FROM rk),
       |pe AS MATERIALIZED (SELECT y.vec_id,
       |    [y.yarr[p.pl[j]] for j in range(1, ${Dim + 1})] AS pemb
       |  FROM yv y CROSS JOIN plist p)""".stripMargin

  val oracle: Map[String, String] = Map(
    // E29: the E28 transform in front of the E11 index — training,
    // assignment, probing, residual PQ, ADC, and the exact re-rank all
    // replay over the rotated coordinates table
    "ann_ivfopq" ->
      s"""WITH $rotationCtes,
         |emb_r AS MATERIALIZED (SELECT vec_id, pemb AS embedding
         |  FROM pe),
         |${Ann.ivfOracleCommonOver("emb_r")},
         |${Ann.ivfPqOracleTailOver("emb_r")}""".stripMargin,
    // E28: exact-integer covariance → unrolled float-synced Givens
    // chain → rotated REAL[] coordinates → the E8/E25 PQ replay; the
    // re-rank scores ORIGINAL vectors (rotations preserve dots)
    "ann_opq" ->
      s"""WITH ${Ann.smpCte},
         |$rotationCtes,
         |sv AS MATERIALIZED (SELECT vec_id, r.s AS sub,
         |    list_slice(pemb, r.s * ${Ann.PqSub} + 1,
         |      r.s * ${Ann.PqSub} + ${Ann.PqSub}) AS sv
         |  FROM pe, range(0, ${Ann.PqM}) r(s)),
         |svt AS (SELECT sv.* FROM sv JOIN smp USING (vec_id)),
         |seed_ids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1
         |    AS code
         |  FROM (SELECT vec_id FROM smp ORDER BY vec_id LIMIT ${Ann.PqK})),
         |cb0 AS (SELECT sv.sub, si.code, sv.sv AS cb_emb
         |  FROM sv JOIN seed_ids si USING (vec_id)),
         |${Ann.pqLloydOracle("cb0", "cb1")},
         |${Ann.pqLloydOracle("cb1", "cb2")},
         |a_enc AS (SELECT sv.vec_id, sv.sub, cb.code, row_number() OVER (
         |    PARTITION BY sv.vec_id, sv.sub
         |    ORDER BY round(list_dot_product(CAST(cb.cb_emb AS DOUBLE[]),
         |        CAST(cb.cb_emb AS DOUBLE[]))
         |      - 2.0 * list_dot_product(CAST(sv.sv AS DOUBLE[]),
         |        CAST(cb.cb_emb AS DOUBLE[])), 6) ASC, cb.code ASC) AS rn
         |  FROM sv JOIN cb2 cb USING (sub)),
         |enc AS (SELECT vec_id, sub, code FROM a_enc WHERE rn = 1),
         |lut AS (SELECT sv.vec_id AS q_id, cb.sub, cb.code,
         |    list_dot_product(CAST(sv.sv AS DOUBLE[]),
         |      CAST(cb.cb_emb AS DOUBLE[])) AS d
         |  FROM sv JOIN cb2 cb USING (sub)
         |  WHERE sv.vec_id < ${Ann.NumQueries}),
         |adot AS (SELECT e.vec_id, l.q_id,
         |    list_reduce(array_agg(l.d ORDER BY e.sub), (a, x) -> a + x)
         |      AS adot
         |  FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
         |  WHERE e.vec_id <> l.q_id
         |  GROUP BY e.vec_id, l.q_id),
         |pruned AS (SELECT q_id, vec_id, row_number() OVER (
         |    PARTITION BY q_id ORDER BY round(adot, 6) DESC, vec_id)
         |      AS crank
         |  FROM adot),
         |scored AS (SELECT p.q_id, p.vec_id,
         |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
         |      CAST(q.embedding AS DOUBLE[])) AS cos
         |  FROM pruned p
         |  JOIN embeddings e ON e.vec_id = p.vec_id
         |  JOIN embeddings q ON q.vec_id = p.q_id
         |  WHERE p.crank <= ${Ann.QuantRerank}),
         |${Ann.topKOracleTail}""".stripMargin
  )
}
