package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

/** G21 `IncrementalMinhashStream` — D19's paraphrase intake gate as a
  * LIVE stream over a PERSISTED store (the stream twin the D19 batch
  * arm was built for): the store's two MinHash sidecars — the
  * (band, bucket) → store-id table and the store-id → 128-perm
  * signature table — live as parquet under one root, every arriving
  * micro-batch scores against them with EXACT batch semantics
  * (`foreachBatch` + [[transformBatch]]), and accepted (novel) docs
  * append INTO the sidecars so the next batch already dedups against
  * them — a paraphrase arriving one batch after its original is
  * caught at intake.
  *
  * Contrast with G20 [[DecontaminateStream]]: the eval set there is
  * small by nature, so its state broadcasts as driver maps. A STORE
  * is corpus-sized, so here the state stays tabular and each batch
  * runs D19's band equi-join ([[graft.dedup.Dedup.intakeMinhashDedup]]
  * — the SAME kernel as the oracled batch arm, so stream and batch
  * can never drift) against the parquet sidecars. Per batch the store
  * text is scanned ZERO times — only band rows and signatures are
  * ever read.
  *
  * State maintenance mirrors E30/E31 ([[graft.ann.IvfIndex]]):
  * [[appendToState]] assigns the delta against the SAME signature
  * kernel and appends under the touched `band=` partitions (append ≡
  * rebuild bit-exactly — spec-pinned: band derivation is per-doc
  * deterministic, order-free); [[maintain]] folds append files back
  * via A36's Compactor, query-invisible by construction.
  *
  * Verdicts are stateless GIVEN the store (a doc's row depends only
  * on the doc and the sidecar contents when its batch runs), so
  * micro-batch boundaries cannot change rows whose store is unchanged
  * — spec-pinned alongside stream ≡ batch on the sf corpus.
  *
  * Reference scope: extends aiesec.py's snapshot-delta intake
  * (aiesec.py:142-144, "what is new since the stored state") to
  * near-duplicate semantics at corpus scale.
  */
object IncrementalMinhashStream {

  import graft.dedup.Dedup.{NumPerms, minhashSidecars, intakeMinhashDedup}

  def bandsDir(root: String): String = s"$root/bands"
  def sigsDir(root: String): String = s"$root/sigs"

  /** (doc_id, sig) from a (doc_id, text) frame — the batch arm's
    * signature chain verbatim (H3 codegen kernel; empty-shingle docs
    * excluded per D19's all-max-sentinel rule).
    */
  def sigFrame(docs: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.minhashSig
    import graft.text.TextOps
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("shingles", TextOps.wordShingles(col("toks")))
      .filter(size(col("shingles")) >= 1)
      .select(col("doc_id"), minhashSig(col("shingles"), NumPerms).as("sig"))
  }

  /** Materialize the two store sidecars under `root` from a store
    * (doc_id, text) frame — the once-per-store build. The band table
    * partitions by `band` (A22's partition-is-the-unit discipline):
    * every append touches all band directories (a signature has all
    * bands), but [[maintain]] compacts per band and the layout keeps
    * each band's buckets co-located for the equi-join.
    */
  def build(spark: SparkSession, storeDocs: DataFrame, root: String): Unit = {
    val sig = sigFrame(storeDocs).localCheckpoint(true, MEMORY_AND_DISK_SER) // feeds both sidecars
    val (bandSc, sigSc) = minhashSidecars(sig)
    bandSc.write.mode("overwrite").partitionBy("band")
      .parquet(bandsDir(root))
    sigSc.write.mode("overwrite").parquet(sigsDir(root))
  }

  /** The CURRENT store sidecars. `band` comes back as the partition
    * directory's inferred int — cast pinned so the equi-join key type
    * never drifts from the posexplode side.
    *
    * A store whose every document has been erased (a legal
    * [[removeFromState]] outcome) leaves the sidecar roots with no
    * data files — parquet schema inference would fail there, so this
    * falls back to EMPTY frames with the pinned sidecar schemas: the
    * store behaves as "matches nothing" rather than erroring the
    * next batch.
    */
  def sidecars(spark: SparkSession, root: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    def readOrEmpty(path: String, schema: StructType): DataFrame =
      try spark.read.parquet(path)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("infer schema") ||
              e.getMessage.contains("PATH_NOT_FOUND") =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    val sigT = ArrayType(LongType, containsNull = false)
    val bands = readOrEmpty(bandsDir(root), StructType(Seq(
      StructField("sid", LongType), StructField("bucket", sigT),
      StructField("band", IntegerType))))
    val sigs = readOrEmpty(sigsDir(root), StructType(Seq(
      StructField("sid", LongType), StructField("ssig", sigT))))
    (bands.withColumn("band", col("band").cast("int")), sigs)
  }

  /** Per-micro-batch intake gate: D19's verdict columns for each doc
    * in `batch`, scored against the store as of NOW. Run it from
    * `foreachBatch` (see [[gate]]) for exact batch semantics.
    */
  def transformBatch(batch: DataFrame, root: String): DataFrame = {
    val (bandSc, sigSc) = sidecars(batch.sparkSession, root)
    intakeMinhashDedup(sigFrame(batch), bandSc, sigSc)
  }

  /** Append a (doc_id, text) delta to the store sidecars — E30's
    * `appendToIndex` mirrored: one signature pass feeds band rows
    * (appended under their `band=` partitions) and signature rows;
    * returns the per-band append report the [[maintain]] trigger
    * reads. Append ≡ rebuild because banding is per-doc and
    * deterministic — a doc lands in the same buckets no matter which
    * batch delivers it.
    */
  def appendToState(spark: SparkSession, root: String,
      accepted: DataFrame): DataFrame = {
    val sig = sigFrame(accepted).localCheckpoint(true, MEMORY_AND_DISK_SER) // both sidecars
    val (bandSc, sigSc) = minhashSidecars(sig)
    bandSc.write.mode("append").partitionBy("band").parquet(bandsDir(root))
    sigSc.write.mode("append").parquet(sigsDir(root))
    bandSc.groupBy(col("band")).agg(count(lit(1)).as("n_appended"))
      .orderBy(col("band"))
  }

  /** Maintenance pass after appends: compact the band store's
    * accumulated append files (A36's Compactor verbatim — E31's
    * maintain shape: tmp-staged swap, row-conservation guard).
    * Query results are unaffected by construction.
    */
  def maintain(spark: SparkSession, root: String): graft.etl.Compactor.Result =
    graft.etl.Compactor.compact(spark, bandsDir(root), Some("band"))

  /** Right-to-erasure surgery on the store sidecars (E33's
    * `eraseFromIndex` mirrored — the G21 maintenance triad's third
    * arm): remove a (doc_id) victim frame from BOTH sidecars so
    * erased documents stop matching future intake, without
    * re-signaturing anything. Returns the per-band report
    * (before/erased/after + exact floor basis points — A26's
    * health-report pattern) materialized BEFORE any file moves.
    *
    * Write amplification is inherent here and worth naming: a
    * signature occupies EVERY band, so a non-empty cohort touches
    * all band partitions (amp ≈ bands, the A41 story at its worst) —
    * still only O(store) bytes total, rewritten via dynamic
    * partition overwrite with fully-erased partitions dropped
    * explicitly. The signature table is unpartitioned and rewrites
    * wholesale from a checkpointed survivor frame. Victims join
    * hash-keyed (a DSAR list at scale is not driver-sized).
    * Erase ≡ rebuild-from-survivors bit-exactly (banding is per-doc
    * deterministic) — spec-pinned.
    */
  def removeFromState(spark: SparkSession, root: String,
      victims0: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // distinct: a duplicated victim id would multiply band rows
    // through the report's left join (n_before/n_erased inflate; the
    // rewrite itself is left_anti and so dup-insensitive)
    val victims = victims0.select(col("doc_id").as("sid")).distinct()
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val (bands, sigs) = sidecars(spark, root)
    val report = bands
      .join(victims.withColumn("erased", lit(1L)), Seq("sid"), "left")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_before"),
        sum(coalesce(col("erased"), lit(0L))).as("n_erased"))
      .withColumn("n_after", col("n_before") - col("n_erased"))
      .withColumn("erased_bp", expr("n_erased * 10000 div n_before"))
      .orderBy(col("band"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val touched = report.filter(col("n_erased") > 0)
      .select(col("band"), col("n_after")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    if (touched.nonEmpty) {
      // checkpoint survivors so the overwrite never reads the files
      // it replaces
      val keep = bands.filter(col("band").isin(touched.map(_._1): _*))
        .join(victims, Seq("sid"), "left_anti")
        .select(col("sid"), col("band"), col("bucket"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      val conf = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(conf)
      spark.conf.set(conf, "dynamic")
      try keep.write.mode("overwrite").partitionBy("band")
        .parquet(bandsDir(root))
      finally prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None => spark.conf.unset(conf)
      }
      // dynamic overwrite can't replace a partition with NOTHING
      val fs = new org.apache.hadoop.fs.Path(bandsDir(root))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.collect { case (band, 0L) => band }.foreach { band =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${bandsDir(root)}/band=$band"), true)
      }
      val keepSigs = sigs.join(victims, Seq("sid"), "left_anti")
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      keepSigs.write.mode("overwrite").parquet(sigsDir(root))
    }
    report
  }

  /** Within-batch near-dup victims among a (doc_id, text) frame: the
    * doc_ids that band-collide with a LOWER-id doc in the SAME frame
    * and match it at the store near-dup bar
    * ([[graft.dedup.Dedup.IncMinhashMinMatches]]). The greedy
    * keep-the-lowest-id rule is deterministic and order-free (a doc's
    * fate depends only on the frame contents, not row order), the
    * standard LSH-dedup tie-break. Used by [[gate]] so two
    * near-duplicates arriving in ONE micro-batch cannot both append.
    */
  private[graft] def intraBatchVictims(docs: DataFrame): DataFrame = {
    import graft.dedup.Dedup.IncMinhashMinMatches
    val sig = sigFrame(docs).localCheckpoint(true, MEMORY_AND_DISK_SER)
    val (bands, sigs) = minhashSidecars(sig)
    val cand = bands
      .join(bands.select(col("band"), col("bucket"),
        col("sid").as("sid2")), Seq("band", "bucket"))
      .filter(col("sid2") < col("sid"))
      .select(col("sid"), col("sid2")).distinct()
    cand
      .join(sigs, Seq("sid"))
      .join(sigs.select(col("sid").as("sid2"), col("ssig").as("ssig2")),
        Seq("sid2"))
      .withColumn("matches", expr(
        "size(filter(zip_with(ssig, ssig2, (x, y) -> x = y), b -> b))"))
      .filter(col("matches") >= IncMinhashMinMatches)
      .select(col("sid").as("doc_id")).distinct()
  }

  /** Wire a streaming (doc_id, text) frame through the gate: per
    * batch, verdicts go to `sink`, and (when `appendNovel`) docs that
    * cleared the near-dup bar append into the store so the NEXT batch
    * dedups against them — the incremental-intake loop. Returns the
    * started query.
    *
    * VERDICTS are store-only by contract (a doc's row depends only on
    * the doc and the store when its batch runs — that is what makes
    * them batch-boundary-invariant over a frozen store). The APPEND
    * path additionally self-dedups each batch ([[intraBatchVictims]]):
    * of two near-duplicates arriving in the SAME micro-batch, only the
    * lowest doc_id appends — closing the blind spot where both would
    * have scored store-only-novel and both appended. Across batches
    * the earlier arrival wins (it is in the store when the later one
    * scores), so store contents are batch-boundary-invariant exactly
    * when doc_ids are monotone with arrival order — the typical
    * intake-sequence case; under out-of-order ids the within-batch
    * winner is the lowest id while the cross-batch winner is the
    * earliest arrival.
    */
  def gate(docs: DataFrame, root: String,
      sink: (DataFrame, Long) => Unit,
      appendNovel: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.localCheckpoint(true, MEMORY_AND_DISK_SER) // verdict + append read it
        val verdicts = transformBatch(b, root).localCheckpoint(true, MEMORY_AND_DISK_SER)
        sink(verdicts, batchId)
        if (appendNovel) {
          val novel = b.join(
            verdicts.filter(col("n_near_dups") === 0)
              .select(col("doc_id")), Seq("doc_id"))
          val kept = novel.join(intraBatchVictims(novel),
            Seq("doc_id"), "left_anti")
          appendToState(spark, root, kept)
          ()
        }
      }
      .start()
}
