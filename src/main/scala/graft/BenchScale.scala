package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale probe (round 10; r9 verdict item 3): every 100× claim in
  * the scale audits was plan-shape-verified only — this main EXECUTES
  * the scale-critical query families one decade up from the largest
  * shipped testdata and reports walls + task metrics at BOTH scales
  * from one session, so byte/task ratios are mechanical (walls on this
  * host carry ~2× co-tenant noise; the metrics don't).
  *
  * No sf1 testdata ships, so the probe derives one deterministically
  * from sf0.1 ([[generate]]): [[Factor]] copies with key-shifted ids —
  * documents and part VERBATIM (within-copy dup/block structure is
  * replicated exactly, and every row additionally gains Factor−1
  * cross-copy exact duplicates, so dup-group and block fanout run
  * STRICTLY HARSHER than a true sf1 draw — a conservative stress for
  * the dedup/blocking family), embeddings with one deterministic
  * per-copy coordinate nudge (+k/100 at dim vec_id%64) so the ANN
  * probes don't degenerate into pure exact-duplicate retrieval.
  *
  * What to read from BENCH_SF1.json: shuffle/input bytes and task
  * counts scaling ≈ linearly in Factor (super-linear growth names a
  * pair/window blowup), zero spill at 10×, and no 1-task stage whose
  * input GREW with the data (AQE coalescing small exchanges to one
  * task is fine; a single task on a grown input is a scaling lie).
  */
object BenchScale {

  val Factor = 10
  val Shift = 10000000L

  /** The scale-critical families named by the r9 verdict. */
  val Probe: Seq[String] = Seq(
    "corpus_pipeline", "dedup_minhash_lsh", "dedup_substring",
    "dedup_substring_pairs", "link_blocking", "emb_knn_graph_ivf",
    "ann_ivfpq_indexed")

  /** Derive the 10× dataset (idempotent via a marker file). */
  def generate(spark: SparkSession, base: String, out: String): Unit = {
    val marker = java.nio.file.Paths.get(out, "_GEN_OK")
    if (java.nio.file.Files.exists(marker)) return
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until Factor).map(k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * Shift)))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val part = spark.read.parquet(s"$base/part.parquet")
    (0 until Factor).map(k =>
      part.withColumn("p_partkey", col("p_partkey") + lit(k * Shift)))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until Factor).map { k =>
      val shifted = emb.withColumn("vec_id", col("vec_id") + lit(k * Shift))
      if (k == 0) shifted
      else shifted.withColumn("embedding", expr(
        s"""transform(embedding, (x, i) ->
           |  x + IF(i = int(vec_id % 64),
           |    cast(${k}d / 100 as float), 0f))""".stripMargin))
    }.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    java.nio.file.Files.createFile(marker)
  }

  def main(args: Array[String]): Unit = {
    val base =
      sys.env.getOrElse("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, base, out)
    val metrics = BenchMetrics.install(spark.sparkContext)
    def once(name: String, dir: String)
        : (Double, BenchMetrics.Snap, Seq[BenchMetrics.StageRec]) = {
      metrics.drainStages(spark.sparkContext)
      val before = metrics.snapshot(spark.sparkContext)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9,
          metrics.snapshot(spark.sparkContext) - before,
          metrics.drainStages(spark.sparkContext))
      } finally spark.catalog.clearCache()
    }
    once(Probe.head, base) // JVM/codegen warmup, not billed
    def f3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val rows = Probe.map { name =>
      val (bSec, bSnap, _) = once(name, base)
      val (sSec, sSnap, sStages) = once(name, out)
      System.err.println(s"[scale] $name base=${f3(bSec)}s sf1=${f3(sSec)}s")
      s"""\"$name\":{"base_sec":${f3(bSec)},"sf1_sec":${f3(sSec)},""" +
        s""""base_metrics":${bSnap.json},"sf1_metrics":${sSnap.json},""" +
        s""""sf1_stages":${sStages.map(_.json).mkString("[", ",", "]")}}"""
    }
    val json =
      s"""{"metric":"sf1_probe","factor":$Factor,"cpus":$cpus,""" +
        s""""base":"$base","sf1_dir":"$out","queries":${
          rows.mkString("{", ",", "}")}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_SF1.json"), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
