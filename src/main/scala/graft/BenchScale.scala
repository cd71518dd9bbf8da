package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

/** 10× scale probe (round 10; r9 verdict item 3): every 100× claim in
  * the scale audits was plan-shape-verified only — this main EXECUTES
  * the scale-critical query families one decade up from the largest
  * shipped testdata and reports walls + task metrics at BOTH scales
  * from one session, so byte/task ratios are mechanical (walls on this
  * host carry ~2× co-tenant noise; the metrics don't).
  *
  * No sf1 testdata ships, so the probe derives one deterministically
  * from sf0.1 ([[generate]]), in TWO variants because replication
  * changes different operators' regimes differently (the first probe
  * run measured exactly this — see SURVEY §8m):
  *
  *  - VERBATIM ([[Factor]] key-shifted copies, text/name bytes
  *    unchanged): per-row statistics are exactly sf0.1's, so
  *    selectivity-dependent pipelines (corpus_pipeline's stopword
  *    gate) scale purely in volume. But every row gains Factor−1
  *    exact cross-copy duplicates — dup GROUPS grow ×Factor and
  *    pair-mining families go quadratic in it, which models a
  *    boilerplate-flooded crawl, not a grown one.
  *  - ISO (each copy's tokens suffixed `_k`, part names too): copies
  *    share NO tokens, so the 10× corpus is Factor independent
  *    sf0.1-shaped corpora — dup/block density per volume is
  *    preserved, the honest model of "10× more of the same data" for
  *    the dedup/blocking family. (Token stats shift, so the stopword
  *    gate would distort — hence two variants, each query probing on
  *    the variant that preserves ITS regime.)
  *
  * Embeddings replicate with a deterministic per-copy coordinate
  * nudge (+k/100 at dim vec_id%64) in both variants. The ANN training
  * cap SELF-SCALES since round 11 ([[graft.ann.Ann.trainCapFor]],
  * clamp(8·⌈√n⌉, 256, 2²⁰)) — the round-10 run of this probe measured
  * exactly why: under the then-fixed cap=256 a 10× corpus packed 10×
  * occupancy into the SAME ~8 cells (within-cell work quadratic in
  * occupancy, emb_knn_graph_ivf 135.4 s), and the manual
  * `-Dgraft.trainCap=2560` rerun (BENCH_SF1_CAP.json) dropped it to
  * 12.0 s. The derivation bakes that measurement in; the system
  * property remains ONLY as a probe-time pin for A/B runs like that
  * one.
  *
  * What to read from BENCH_SF1.json: shuffle/input bytes and task
  * counts scaling ≈ linearly in Factor (super-linear growth names a
  * pair/window blowup), zero spill at 10×, and no 1-task stage whose
  * input GREW with the data (AQE coalescing small exchanges to one
  * task is fine; a single task on a grown input is a scaling lie).
  */
object BenchScale {

  /** Replication factor: 10 by default (one decade up from sf0.1).
    * SPARK_GRAFT_FACTOR overrides for the two-decade probe (§9d) —
    * every sf0.1 key is < 150 000, so k·Shift shifts stay
    * collision-free far past factor 100.
    */
  val Factor: Int = sys.env.getOrElse("SPARK_GRAFT_FACTOR", "10").toInt
  val Shift = 10000000L

  /** The scale-critical families named by the r9 verdict (first
    * seven) plus the four families the r10 verdict asked to cover
    * (graph via the shared copurchase edge build, semantic dedup
    * under growing cell occupancy, DSIR selection, and the substring
    * stream's batch arm), each with the dataset variant that
    * preserves its regime at 10×: graph keys ride ISO (copies share
    * no part keys, so the 10× graph is 10 disjoint sf0.1 graphs —
    * "10× more of the same catalog", keeping edge density honest
    * where verbatim would ×10 every support count on the SAME edge
    * set); the semantic-dedup pair rides VERBATIM (embeddings
    * replicate with the per-copy nudge — exactly the growing-cell
    * regime that bit emb_knn_graph_ivf in r10); dsir rides VERBATIM
    * (token statistics must stay sf0.1's for the importance weights
    * to keep their regime); the substring batch arm rides ISO (the
    * keep-first rule would see every verbatim copy as 100% dup —
    * boilerplate flood, not growth).
    */
  val Probe: Seq[(String, String)] = Seq(
    "corpus_pipeline" -> "verbatim",
    "dedup_minhash_lsh" -> "iso",
    "dedup_substring" -> "iso",
    "dedup_substring_pairs" -> "iso",
    "link_blocking" -> "iso",
    "emb_knn_graph_ivf" -> "verbatim",
    "ann_ivfpq_indexed" -> "verbatim",
    "graph_triangles" -> "iso",
    "graph_betweenness" -> "iso",
    "dedup_semantic" -> "verbatim",
    "dedup_semantic_sweep" -> "verbatim",
    "corpus_dsir_select" -> "verbatim",
    "stream_substring_dedup" -> "iso",
    // round 11: the event-window family had no probe entry at all —
    // events replicate as user-disjoint copies (user_id and event_id
    // key-shifted, identical in both variants since no probed text/
    // part key interacts), i.e. 10× more users with sf0.1's per-user
    // behavior — exactly how an event log grows. One representative
    // per plan shape: the union-sort-window as-of join, the gap
    // sessionizer, and the B96 CEP window pass.
    "asof_join" -> "verbatim",
    "sessionize" -> "verbatim",
    "events_sequence_match" -> "verbatim",
    // late round 11: the new Borůvka forest rides the graph family's
    // iso regime (10 disjoint sf0.1 graphs — honest growth)
    "graph_mst" -> "iso",
    // round 12: the weighted-paths tier rides the graph family's iso
    // regime; fuzzy decontamination rides iso (banded-LSH family —
    // dup density per volume preserved); the heavy-hitters batch arm
    // rides VERBATIM (per-token frequencies must keep their regime —
    // iso splits every token's mass across 10 disjoint vocabularies)
    "graph_weighted_paths" -> "iso",
    "decontaminate_fuzzy" -> "iso",
    "stream_heavy_hitters" -> "verbatim",
    // round 13: the rerank-pool arms converted from rank windows to
    // the bounded-heap TopK — spill 0 at the constrained heap is the
    // claim under test (the window spelling's map-side rank-sort was
    // the 43 GB factor-100 spill in the knn family). All ride
    // VERBATIM: embeddings replicate with the per-copy nudge, the
    // growing-candidate-pool regime the heap must bound.
    "ann_quantized" -> "verbatim",
    "ann_bq" -> "verbatim",
    "ann_pq" -> "verbatim",
    "hybrid_mmr_multi" -> "verbatim",
    // round 13: the record-linkage chain (A45 → A46 → A47) above
    // factor 10 — its BlockCap discipline is spec-asserted but had
    // never executed above sf1. ISO like the rest of the part-keyed
    // family: copies share no tokens or part keys, so the 100× run
    // is 100 disjoint catalogs (honest block-size growth).
    "link_entities" -> "iso",
    "link_survivorship" -> "iso")

  private def replicate(df: DataFrame, key: String): DataFrame =
    (0 until Factor).map(k =>
      df.withColumn(key, col(key) + lit(k * Shift))
        .withColumn("_copy", lit(k)))
      .reduce(_.unionByName(_))

  /** Derive both 10× variants (idempotent via a marker file). */
  def generate(spark: SparkSession, base: String, out: String): Unit = {
    val marker = java.nio.file.Paths.get(s"$out-verbatim", "_GEN_OK")
    if (java.nio.file.Files.exists(marker)) return
    val docs = replicate(
      spark.read.parquet(s"$base/documents.parquet"), "doc_id")
    docs.drop("_copy")
      .write.mode("overwrite").parquet(s"$out-verbatim/documents.parquet")
    // iso: suffix every token with the copy tag — copies share no
    // vocabulary, so dup/block structure is Factor independent copies
    // of sf0.1's, not Factor-fold groups
    // tokenize with the framework's \s+ rule (TextOps.tokens): a plain
    // ' ' split would turn runs of whitespace into empty tokens that
    // become bare `_k` tokens after suffixing, distorting the iso
    // variant's token statistics vs "Factor independent sf0.1 corpora"
    val isoDocs = docs.withColumn("text",
      when(col("_copy") === 0, col("text"))
        .otherwise(expr(
          """array_join(transform(
            |  filter(split(text, '\\s+'), t -> t != ''),
            |  t -> concat(t, '_', cast(_copy as string))), ' ')""".stripMargin)))
      .drop("_copy")
    isoDocs.write.mode("overwrite").parquet(s"$out-iso/documents.parquet")
    val part = replicate(
      spark.read.parquet(s"$base/part.parquet"), "p_partkey")
    part.drop("_copy")
      .write.mode("overwrite").parquet(s"$out-verbatim/part.parquet")
    part.withColumn("p_name",
      when(col("_copy") === 0, col("p_name"))
        .otherwise(expr(
          """array_join(transform(
            |  filter(split(p_name, '\\s+'), t -> t != ''),
            |  t -> concat(t, '_', cast(_copy as string))), ' ')""".stripMargin)))
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$out-iso/part.parquet")
    val emb = replicate(
      spark.read.parquet(s"$base/embeddings.parquet"), "vec_id")
      .withColumn("embedding", expr(
        """transform(embedding, (x, i) ->
          |  cast(x + IF(_copy > 0 AND i = int(vec_id % 64),
          |    cast(_copy as double) / 100, 0d) as float))""".stripMargin))
      .drop("_copy")
      .localCheckpoint(true, MEMORY_AND_DISK_SER)
    emb.write.mode("overwrite").parquet(s"$out-verbatim/embeddings.parquet")
    emb.write.mode("overwrite").parquet(s"$out-iso/embeddings.parquet")
    // lineitem feeds the graph family's shared co-purchase edge
    // build. VERBATIM shifts only the order key: every copied basket
    // re-references the ORIGINAL parts, so the edge SET is sf0.1's
    // with ×Factor support (the boilerplate model). ISO shifts the
    // part key too: copies share no parts, so the 10× graph is
    // Factor disjoint sf0.1 graphs — the honest growth model the
    // graph probes ride.
    val li = replicate(
      spark.read.parquet(s"$base/lineitem.parquet"), "l_orderkey")
    li.drop("_copy")
      .write.mode("overwrite").parquet(s"$out-verbatim/lineitem.parquet")
    li.withColumn("l_partkey", col("l_partkey") + col("_copy") * Shift)
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$out-iso/lineitem.parquet")
    // events replicate as user-disjoint copies (both keys shifted so
    // no copy shares users or event ids) — the honest growth model
    // for an event log: 10× the users, per-user behavior unchanged
    val evr = replicate(
      spark.read.parquet(s"$base/events.parquet"), "event_id")
      .withColumn("user_id", col("user_id") + col("_copy") * Shift)
      .drop("_copy")
      .localCheckpoint(true, MEMORY_AND_DISK_SER)
    evr.write.mode("overwrite").parquet(s"$out-verbatim/events.parquet")
    evr.write.mode("overwrite").parquet(s"$out-iso/events.parquet")
    // pass the remaining tables through UNreplicated so every probed
    // key's DuckDB oracle can run against the sf1 dirs (CHECK_SF1:
    // the oracle views bind all ten tables)
    Seq("region", "nation", "customer", "supplier", "orders")
      .foreach { t =>
        val df = spark.read.parquet(s"$base/$t.parquet")
        df.write.mode("overwrite").parquet(s"$out-verbatim/$t.parquet")
        df.write.mode("overwrite").parquet(s"$out-iso/$t.parquet")
      }
    java.nio.file.Files.createFile(marker)
  }

  def main(args: Array[String]): Unit = {
    val base =
      sys.env.getOrElse("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_OUT", "BENCH_SF1.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // a real cluster scales shuffle partitions with the data, keeping
    // PER-TASK state flat; this knob lets the probe separate "plan
    // scales superlinearly" from "per-task state grew because the
    // partition count stayed fixed while the data 10×'d"
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
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
    val selected = Probe.filter(p => only.forall(_.contains(p._1)))
    require(selected.nonEmpty, s"SPARK_GRAFT_ONLY matched no probe " +
      s"queries; known: ${Probe.map(_._1).mkString(",")}")
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
    once(selected.head._1, base) // JVM/codegen warmup, not billed
    def f3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val rows = selected.map { case (name, variant) =>
      val (bSec, bSnap, _) = once(name, base)
      val (sSec, sSnap, sStages) = once(name, s"$out-$variant")
      System.err.println(
        s"[scale] $name($variant) base=${f3(bSec)}s sf1=${f3(sSec)}s")
      s"""\"$name\":{"variant":"$variant","base_sec":${f3(bSec)},""" +
        s""""sf1_sec":${f3(sSec)},"base_metrics":${bSnap.json},""" +
        s""""sf1_metrics":${sSnap.json},""" +
        s""""sf1_stages":${sStages.map(_.json).mkString("[", ",", "]")}}"""
    }
    val json =
      s"""{"metric":"sf1_probe","factor":$Factor,"cpus":$cpus,""" +
        s""""train_cap_override":${graft.ann.Ann.TrainCapOverride
          .map(_.toString).getOrElse("null")},"base":"$base",""" +
        s""""sf1_dir":"$out","queries":${rows.mkString("{", ",", "}")}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
