package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

/** E27 `emb_knn_graph` — the mutual k-nearest-neighbor graph over an
  * embedding column: the standard substrate for density-based corpus
  * clustering, SemDeDup-style pruning, and label propagation (an edge
  * (u, v) exists iff v is in u's top-k AND u is in v's top-k — the
  * mutuality filter is what strips hub vectors' one-directional
  * arms, which is why kNN-graph pipelines use it).
  *
  * Two arms share the rank window and the mutuality join:
  *
  *  - `emb_knn_graph` — the EXACT baseline: all-pairs scoring with the
  *    corpus broadcast to one side (spread across cores first — the
  *    O(n²) stage must never run as one task). Corpus-quadratic by
  *    construction; the oracle anchor and the recall yardstick.
  *  - `emb_knn_graph_ivf` — the 100 TB arm: E10's coarse quantizer
  *    partitions the corpus into cells, every vector multi-probes its
  *    [[KnnGraph.KnnProbes]] nearest cells, and scoring runs ONLY against the
  *    home-cell members of the probed cells — a co-partitioned
  *    equi-join on cell_id (D9 `dedup_semantic`'s shape), O(Σ probes ×
  *    cell size) instead of O(n²). Candidate restriction is the ONLY
  *    difference: rank window, top-k, and the reversed-key mutuality
  *    join are byte-identical to the exact arm, so the IVF graph is a
  *    subgraph whose recall the spec pins against the exact edges.
  */
object KnnGraph {

  val KnnK = 5 // neighbors per node

  /** Cells each vector probes for candidates in the IVF arm. Deeper
    * than E3's query-time floor (4): the mutual filter compounds
    * per-endpoint candidate misses (an edge needs BOTH endpoints to
    * surface the other), and graph build is a one-off batch job where
    * recall is worth more than per-probe latency. At test SF this is
    * 6 of ~8 cells; at a real corpus the cell count scales with the
    * training cap, so the probed fraction shrinks with scale.
    */
  val KnnProbes = 6

  /** Deterministic per-node top-k of a scored (u, v, cos) frame — rank
    * on the 6-dp-rounded cosine with v tiebreak (stable under last-bit
    * float jitter cross-engine), keep [[KnnK]].
    *
    * Round 12: runs on the H5 bounded-heap operator instead of a
    * row_number window. The window spelling shuffles EVERY candidate
    * pair on u and then fully sorts each partition before discarding
    * all but k — at factor 100 that rank-sort spilled 43 GB
    * (BENCH_SF100), and at factor 1000 its ~1.3 TB of candidate rows
    * exceeded the probe host's disk outright. TopKExec's map-side
    * partial keeps a k-row heap per (u, partition) BEFORE the
    * exchange, so the shuffle carries ≤ probes·blocks·k rows per node
    * (~GBs at factor 1000, zero sort, zero spill) — the same
    * reduction partial aggregation gives groupBy, applied to ranking.
    * Output is row-identical to the window spelling (same total
    * order, same rank), which the oracle gate re-certifies.
    */
  private def topkOf(scored: DataFrame): DataFrame =
    graft.plans.TopKOps.topK(
      scored.withColumn("cos_r", round(col("cos"), 6)),
      groupBy = Seq("u"),
      orderBy = Seq("cos_r" -> false, "v" -> true),
      k = KnnK)
      .select(col("u"), col("v"), col("rank"), col("cos"))
      // both sides of the mutuality join read this frame — O(n·k)
      // rows; without the checkpoint the candidate-scoring pass
      // re-executes per side (plan-verified: two scoring subtrees)
      .localCheckpoint(true, MEMORY_AND_DISK_SER)

  /** Mutual edges (u < v) from a directed top-k frame: equi self-join
    * on the REVERSED (u, v) key keeps exactly the pairs ranked by both
    * endpoints.
    */
  private def mutualEdges(topk: DataFrame): DataFrame =
    topk.as("a").join(topk.as("b"),
        col("a.u") === col("b.v") && col("a.v") === col("b.u") &&
          col("a.u") < col("a.v"))
      .select(col("a.u").as("u"), col("a.v").as("v"),
        col("a.rank").as("rank_uv"), col("b.rank").as("rank_vu"),
        round(col("a.cos"), 4).as("cos"))

  /** Mutual-kNN edges of a `(vec_id, embedding)` frame, exact arm:
    * all-pairs scoring (broadcast one side, SPREAD the other so the
    * quadratic stage uses every core — single-file scans arrive as one
    * split), symmetric cosine (same accumulation order on both
    * engines, so bit-equal).
    */
  private[ann] def mutualKnn(c0: DataFrame): DataFrame = {
    val c = c0.select(col("vec_id"), col("embedding"))
    val spread = c.repartition(
      c0.sparkSession.sparkContext.defaultParallelism)
    val scored = spread
      .join(broadcast(c.select(col("vec_id").as("v_id"),
        col("embedding").as("v_emb"))), col("vec_id") =!= col("v_id"))
      .select(col("vec_id").as("u"), col("v_id").as("v"),
        cosineSim(col("embedding"), col("v_emb")).as("cos"))
    mutualEdges(topkOf(scored))
  }

  /** Corpus-size bound for the exact all-pairs arm (round 11, verdict
    * #3): at or below it the O(n²) scoring is cheaper than training a
    * quantizer and provably exact — the oracle anchor regime every
    * test SF sits in (≤ 64k vectors ⇒ ≤ ~4·10⁹ dot products, spread
    * over all cores); above it the same keys transparently run the
    * cell-restricted IVF arm (same output contract, recall-bounded),
    * the way `Dedup.connectedComponents` already sizes its
    * driver-vs-distributed arms at runtime. One column-pruned count
    * decides — no knob for a 100× deployment to mis-set.
    */
  val KnnExactMaxVectors = 65536L

  /** [[embKnnGraph]]'s size-gated kernel: exact all-pairs at or below
    * `exactMax` vectors, [[mutualKnnIvf]] above (parameterized so the
    * spec can force the above-bound arm on a small corpus).
    */
  private[ann] def mutualKnnGated(spark: SparkSession, c0: DataFrame,
      exactMax: Long = KnnExactMaxVectors): DataFrame =
    if (c0.select(col("vec_id")).count() <= exactMax) mutualKnn(c0)
    else mutualKnnIvf(spark, c0)

  def embKnnGraph(spark: SparkSession, dir: String): DataFrame =
    embKnnGraphOf(Tables(spark, dir, "embeddings"))

  /** [[embKnnGraph]]'s kernel on caller embeddings frame. */
  def embKnnGraphOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    mutualKnnGated(spark, emb)
      .orderBy(col("u"), col("v"))
  }

  /** IVF arm: candidates = probed-cell × home-cell pairs. Training is
    * the bounded-sample E3 quantizer ([[Ann.refinedCentroids]]);
    * centroids broadcast at any corpus size, the corpus is scanned
    * once for home-cell assignment and once for the multi-probe (both
    * spread), and the candidate join shuffles both sides on cell_id
    * only — nothing corpus-sized is ever broadcast or crossed.
    */
  private[ann] def mutualKnnIvf(spark: SparkSession,
      c0: DataFrame): DataFrame =
    mutualEdges(topkOf(ivfScored(spark, c0)))

  /** The IVF arm's candidate-scoring frame (u, v, cos) — exposed
    * separately so the spec can pin its physical plan (the topkOf
    * localCheckpoint materializes it eagerly, hiding the scoring
    * subtree from the final query's plan).
    */
  private[ann] def ivfScored(spark: SparkSession,
      c0: DataFrame): DataFrame = {
    val c = c0.select(col("vec_id"), col("embedding"))
    val cents = Ann.refinedCentroids(spark, c)
    val spread = c.repartition(spark.sparkContext.defaultParallelism)
    val asg = Ann.assignCells(spread, cents)
      .select(col("cell_id"), col("vec_id").as("v"),
        col("embedding").as("v_emb"))
    // fixed-depth probe (vs E3's margin-expanded rule): every vector
    // takes its [[KnnProbes]] nearest cells. Below the two-level gate
    // that is the flat O(n·cells) broadcast scan; above it (r13) the
    // super-cell layer prunes candidates to √cells·(1+SuperProbes)
    // dots per vector — cells ∝ √n made the flat scan O(n^1.5), the
    // assignment-stage growth the factor-1000 knncap probe measured.
    // Selection runs on the H5 bounded heap either way (r13 — the
    // rank-window spelling sorted every (vector × cell) row).
    // The explicit vec_id-hash repartition AHEAD of the scoring stage
    // is user-specified so AQE cannot coalesce it to one task and
    // drag the candidate scoring onto one core; the TopK final phase
    // reuses the same hash partitioning, so no second exchange.
    val nCells = math.max(cents.count(), 1L)
    val spreadU = spread
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    val candCells =
      if (nCells <= Ann.TwoLevelMinCells) spreadU.crossJoin(broadcast(cents))
      else Ann.superCellCandidates(spreadU, cents)
    val probes = graft.plans.TopKOps.topK(
      candCells
        .withColumn("p_cos_r",
          round(cosineSim(col("embedding"), col("c_emb")), 6)),
      groupBy = Seq("vec_id"),
      orderBy = Seq("p_cos_r" -> false, "cell_id" -> true),
      k = KnnProbes, rankName = "rn")
      .select(col("cell_id"), col("vec_id").as("u"),
        col("embedding").as("u_emb"))
    // Self-tuning block fan-out for the scoring join: its parallelism
    // is bounded by the distinct-cell count, which at test SF (tiny
    // derived cap → ~8 cells) is below the core count — and the shuffle
    // is byte-light but CPU-heavy, so AQE's size-based coalescing
    // makes it worse, not better. Sub-split each cell into
    // B = ⌈cores / cells⌉ blocks: the corpus side keys each row by
    // pmod(v, B) (no replication), the probe side fans out ×B. At a
    // real corpus the quantizer has cells ≫ cores, so B = 1 and the
    // fan-out is the identity — the knob only spends probe-side
    // duplication when the cluster would otherwise sit idle. The
    // explicit co-repartition on (cell_id, blk) is user-specified so
    // AQE cannot coalesce the quadratic-work stage down to one task.
    val par = spark.sparkContext.defaultParallelism
    val blocks = ((par + nCells - 1) / nCells).toInt
    val asgB = asg
      .withColumn("blk", pmod(col("v"), lit(blocks)).cast("int"))
      .repartition(par, col("cell_id"), col("blk"))
    val probesB = probes
      .withColumn("blk", explode(sequence(lit(0), lit(blocks - 1))))
      .repartition(par, col("cell_id"), col("blk"))
    probesB.join(asgB, Seq("cell_id", "blk"))
      .filter(col("u") =!= col("v"))
      .select(col("u"), col("v"),
        cosineSim(col("u_emb"), col("v_emb")).as("cos"))
  }

  def embKnnGraphIvf(spark: SparkSession, dir: String): DataFrame =
    embKnnGraphIvfOf(Tables(spark, dir, "embeddings"))

  /** [[embKnnGraphIvf]]'s kernel on caller embeddings frame. */
  def embKnnGraphIvfOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    mutualKnnIvf(spark, emb)
      .orderBy(col("u"), col("v"))
  }

  /** The IVF knn-graph kernel over an arbitrary embeddings frame —
    * the upper-decade scale probe's entry ([[graft.BenchKnnCap]]).
    */
  private[graft] def embKnnGraphFrame(spark: SparkSession,
      c0: DataFrame): DataFrame =
    mutualKnnIvf(spark, c0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_knn_graph" -> (embKnnGraph _),
    "emb_knn_graph_ivf" -> (embKnnGraphIvf _)
  )

  val oracle: Map[String, String] = Map(
    // the directed top-k replays with the ann_topk rounded-rank
    // window; mutuality is the same reversed-key self-join
    "emb_knn_graph" ->
      s"""WITH scored AS (SELECT a.vec_id AS u, b.vec_id AS v,
         |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
         |      CAST(b.embedding AS DOUBLE[])) AS cos
         |  FROM embeddings a JOIN embeddings b
         |    ON a.vec_id <> b.vec_id),
         |r AS (SELECT u, v, cos, row_number() OVER (PARTITION BY u
         |    ORDER BY round(cos, 6) DESC, v) AS rank FROM scored),
         |k AS (SELECT * FROM r WHERE rank <= $KnnK)
         |SELECT x.u, x.v, x.rank AS rank_uv, y.rank AS rank_vu,
         |  round(x.cos, 4) AS cos
         |FROM k x JOIN k y ON y.u = x.v AND y.v = x.u
         |WHERE x.u < x.v
         |ORDER BY x.u, x.v""".stripMargin,
    // IVF arm: the shared E3 training/assignment replay (asg1 = full
    // corpus with home cells, cents = refined centroids), then the
    // margin-expanded multi-probe over EVERY vector, cell-restricted
    // scoring, and the same rank + mutuality tail as the exact arm
    "emb_knn_graph_ivf" ->
      s"""${Ann.ivfOracleCommon},
         |kp0 AS (SELECT e.vec_id AS u, e.embedding AS u_emb, c.cell_id,
         |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
         |      CAST(c.c_emb AS DOUBLE[])), 6) AS q6
         |  FROM embeddings e CROSS JOIN cents c),
         |kp1 AS (SELECT *, row_number() OVER (PARTITION BY u
         |      ORDER BY q6 DESC, cell_id ASC) AS rn
         |  FROM kp0),
         |kprobes AS (SELECT u, u_emb, cell_id FROM kp1
         |  WHERE rn <= $KnnProbes),
         |kscored AS (SELECT p.u, a.vec_id AS v,
         |    list_cosine_similarity(CAST(p.u_emb AS DOUBLE[]),
         |      CAST(a.embedding AS DOUBLE[])) AS cos
         |  FROM kprobes p JOIN asg1 a USING (cell_id)
         |  WHERE a.vec_id <> p.u),
         |kr AS (SELECT u, v, cos, row_number() OVER (PARTITION BY u
         |    ORDER BY round(cos, 6) DESC, v) AS rank FROM kscored),
         |kk AS (SELECT * FROM kr WHERE rank <= $KnnK)
         |SELECT x.u, x.v, x.rank AS rank_uv, y.rank AS rank_vu,
         |  round(x.cos, 4) AS cos
         |FROM kk x JOIN kk y ON y.u = x.v AND y.v = x.u
         |WHERE x.u < x.v
         |ORDER BY x.u, x.v""".stripMargin
  )
}
