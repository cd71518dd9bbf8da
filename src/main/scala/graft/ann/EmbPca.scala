package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** E14 `emb_pca` — dominant principal component of the embedding
  * corpus (the standard curation diagnostic: anisotropy check, "rogue
  * dimension" hunting, whitening prep), built on the `gram_upper`
  * exact integer Gram aggregate (graft/functions/GramUpper.scala).
  *
  * The 100 TB shape: ONE distributed pass accumulates the exact
  * d(d+1)/2 integer second-moment matrix and the exact per-dimension
  * integer sums (both mergeable, order-independent, O(d²) bytes per
  * partition — no row explosion); the O(d²) covariance eigen-iteration
  * then runs on the driver, which is the right place for a 64×64
  * problem. The corpus is touched once more only to project every
  * vector onto the learned direction — map-only against broadcast
  * literals.
  *
  * Cross-engine exactness: the integer accumulators are bit-equal on
  * any engine/partitioning (that is what gram_upper exists for), the
  * covariance entries derive from them elementwise (same IEEE ops both
  * sides), and each power-iteration round ends with a float cast — the
  * same jitter-absorption point the Lloyd oracles use — so the DuckDB
  * replay walks through the identical iterate sequence. Projection
  * scores round to 4 dp on output.
  */
object EmbPca {

  val Dim = 64   // embeddings table dimension (oracles pin it too)
  val Iters = 8  // power-iteration rounds, unrolled in the oracle

  def embPca(spark: SparkSession, dir: String): DataFrame =
    embPcaOf(Tables(spark, dir, "embeddings"))

  /** [[embPca]]'s kernel on any embeddings-shaped frame. */
  def embPcaOf(emb: DataFrame): DataFrame = {
    val c = emb
      .select(col("vec_id"), col("embedding"))
    // exact integer accumulation, ONE distributed pass: Gram upper
    // triangle via the custom aggregate, plus the 64 per-dim
    // micro-unit sums as sibling aggregate columns in the SAME agg —
    // all mergeable partials, no second scan, no posexplode fan-out
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
      s"emb_pca: expected dim $Dim, got gram of ${g.length}")
    val s = (0 until Dim).map(i => i -> gRow.getAs[Long](s"s$i")).toMap
    // covariance C = G/n − (S/n)(S/n)ᵀ, elementwise off exact integers
    // (micro-unit² scale — scale cancels in the direction)
    val cm = Array.ofDim[Double](Dim, Dim)
    var k = 0
    for (i <- 0 until Dim; j <- i until Dim) {
      val cij = (g(k).toDouble - s(i).toDouble * s(j).toDouble / n) / n
      cm(i)(j) = cij
      cm(j)(i) = cij
      k += 1
    }
    // power iteration from the exact-in-binary uniform start 1/√64;
    // each round float-syncs so both engines walk the same iterates
    var v = Array.fill(Dim)(0.125)
    for (_ <- 1 to Iters) {
      val w = Array.tabulate(Dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < Dim) { acc += cm(i)(j) * v(j); j += 1 }
        acc
      }
      val nm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(x => (x / nm).toFloat.toDouble)
    }
    // project every vector onto the direction: index-ordered chained
    // sum (mirrors list_dot_product), map-only over the corpus
    val pc = (0 until Dim)
      .map(i => col("embedding").getItem(i).cast("double") * lit(v(i)))
      .reduce(_ + _)
    c.select(col("vec_id"), round(pc, 4).as("pc1"))
      .orderBy(col("vec_id"))
  }

  /** One SQL power-iteration round: matvec over the mirrored
    * covariance rows, normalize, float-sync (REAL cast then back to
    * DOUBLE — exactly `.toFloat.toDouble`).
    */
  private def iterCte(t: Int): String = {
    val pv = if (t == 1) "v0" else s"v${t - 1}"
    s"""w$t AS (SELECT c.i, sum(c.c * v.v) AS w
       |  FROM cov c JOIN $pv v ON v.i = c.j GROUP BY c.i),
       |n$t AS (SELECT sqrt(sum(w * w)) AS nm FROM w$t),
       |v$t AS (SELECT i, CAST(CAST(w / nm AS REAL) AS DOUBLE) AS v
       |  FROM w$t CROSS JOIN n$t)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_pca" -> (embPca _)
  )

  val oracle: Map[String, String] = Map(
    "emb_pca" ->
      s"""WITH q AS (SELECT vec_id,
         |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
         |      for i in range(1, ${Dim + 1})] AS q
         |  FROM embeddings),
         |nn AS (SELECT count(*) AS n FROM q),
         |g AS (SELECT ii.i AS i, jj.j AS j, sum(q.q[ii.i] * q.q[jj.j]) AS g
         |  FROM q, range(1, ${Dim + 1}) ii(i), range(1, ${Dim + 1}) jj(j)
         |  WHERE jj.j >= ii.i GROUP BY ii.i, jj.j),
         |s AS (SELECT ii.i AS i, sum(q.q[ii.i]) AS s
         |  FROM q, range(1, ${Dim + 1}) ii(i) GROUP BY ii.i),
         |cov0 AS (SELECT g.i, g.j,
         |    (CAST(g.g AS DOUBLE)
         |      - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE) / nn.n) / nn.n
         |      AS c
         |  FROM g JOIN s si ON si.i = g.i JOIN s sj ON sj.i = g.j
         |  CROSS JOIN nn),
         |cov AS (SELECT i, j, c FROM cov0
         |  UNION ALL SELECT j AS i, i AS j, c FROM cov0 WHERE i <> j),
         |v0 AS (SELECT r.i, CAST(0.125 AS DOUBLE) AS v
         |  FROM range(1, ${Dim + 1}) r(i)),
         |${(1 to Iters).map(iterCte).mkString(",\n")}
         |SELECT e.vec_id,
         |  round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
         |    (SELECT array_agg(v ORDER BY i) FROM v$Iters)), 4) AS pc1
         |FROM embeddings e ORDER BY e.vec_id""".stripMargin
  )
}
