package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dotF

/** E23 `ann_ivfpq_indexed` — the FULLY-compressed on-disk index: E21's
  * build-once layout carrying E11's PQ codes instead of raw vectors.
  * At rest the index stores one partition value (cell id) + [[Ann.PqM]]
  * one-byte codes per vector plus two driver-sized sidecars (centroids,
  * codebook) — at dim 64 that is the ~32× at-rest cut a 100 TB corpus
  * actually needs, and the number E11 only talks about becomes the
  * literal bytes-on-disk here. Embeddings do NOT live in the index:
  * the exact re-rank joins its ≤[[Ann.IvfPqRerank]]-per-query
  * shortlist back to the PRIMARY embeddings table by vec_id — a
  * shortlist-driven semi-join read, never a second corpus scan of the
  * index side.
  *
  * Query plan shape: probe selection against the broadcast centroid
  * sidecar → the code scan filtered to probed cells via a literal
  * IN-list (directory-level `PartitionFilters` pruning, as E21) → ADC
  * scoring in m map-lookups per candidate → rank-window shortlist →
  * embeddings join for the exact re-rank. Results are bit-identical
  * to E11 `ann_ivfpq` (same training, assignment, ADC arithmetic,
  * rank windows), so E11's oracle replays this query and the parity
  * is additionally spec-pinned.
  */
object PqIndex {

  def vectorsDir(root: String): String = s"$root/vectors"
  def centroidsDir(root: String): String = s"$root/centroids"
  def codebookDir(root: String): String = s"$root/codebook"

  private def residual(df: DataFrame): DataFrame =
    df.withColumn("res", expr("zip_with(embedding, c_emb, (a, b) -> a - b)"))

  /** Train (one sample collect feeds both quantizers, as E11) and
    * materialize: cell-partitioned code lists + the two sidecars.
    */
  def build(spark: SparkSession, dir: String, root: String): Unit = {
    val c = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val sample = Ann.trainSample(spark, c)
    val refined = Ann.refineLocal(spark, sample)
    val resSample = residual(
      Ann.assignCells(sample, refined).join(broadcast(refined), Seq("cell_id")))
      .select(col("vec_id"), col("res").as("embedding"))
    val cb = Ann.pqTrainLocal(spark, resSample)
    refined.coalesce(1).write.mode("overwrite").parquet(centroidsDir(root))
    cb.coalesce(1).write.mode("overwrite").parquet(codebookDir(root))
    // hash-cluster by the partition column before the partitioned
    // write: without it AQE coalesces the tiny pre-write exchange to
    // ONE task which then opens every `cell_id=` directory serially
    // (the r15 baseline's single 1.3 s WriteFiles stage); clustered,
    // each of the defaultParallelism tasks writes its own cells in
    // parallel and each cell still lands in exactly one file (guide
    // §6 output sizing — same discipline at cluster scale).
    encodeFrame(c, refined, cb)
      .repartition(c.sparkSession.sparkContext.defaultParallelism,
        col("cell_id"))
      .sortWithinPartitions(col("cell_id"), col("vec_id"))
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(vectorsDir(root))
  }

  /** Assign + residual-encode a vector frame against EXPLICIT
    * quantizers → the (cell_id, vec_id, codes) at-rest rows.
    * [[build]]'s encode half, shared with [[appendToIndex]] (stored
    * sidecars in, identical codes out) and the equivalence spec.
    */
  def encodeFrame(c: DataFrame, refined: DataFrame,
      cb: DataFrame): DataFrame = {
    // checkpoint the assigned+residual frame: it feeds BOTH the
    // subvector/code chain and the cell_id join-back, and uncached the
    // coarse assignment (a corpus scan + argmin over every centroid)
    // runs twice (r15 opt; guide §1.2 — don't compute things twice).
    // Serialized storage per the r14 house rule for re-read frames.
    val asg = residual(
      Ann.assignCells(c, refined).join(broadcast(refined), Seq("cell_id")))
      .select(col("vec_id"), col("cell_id"), col("res"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val sv = Ann.subvecFrame(
      asg.select(col("vec_id"), col("res").as("embedding")),
      "embedding", "vec_id")
    Ann.assignCodes(sv, cb)
      .groupBy(col("vec_id"))
      .agg(Ann.codesAgg.as("codes"))
      .join(asg.select(col("vec_id"), col("cell_id")), Seq("vec_id"))
      .select(col("cell_id"), col("vec_id"), col("codes"))
  }

  /** Append a (vec_id, embedding) delta to a BUILT compressed index
    * without retraining: coarse assignment AND residual PQ encoding
    * both run against the STORED sidecars (centroids + codebook are
    * the frozen artifacts — a vector gets the same cell and the same
    * codes no matter which batch delivers it, so append ≡
    * rebuild-under-the-same-sidecars bit-exactly, spec-pinned);
    * appends files only under touched `cell_id=` partitions (A23's
    * discipline). Returns the per-cell report feeding [[maintain]].
    */
  def appendToIndex(spark: SparkSession, root: String,
      delta: DataFrame): DataFrame = {
    val refined = spark.read.parquet(centroidsDir(root))
    val cb = spark.read.parquet(codebookDir(root))
    val rows = encodeFrame(
      delta.select(col("vec_id"), col("embedding")), refined, cb)
      .localCheckpoint(true,  // one encode feeds the write AND the report
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    rows.write.mode("append").partitionBy("cell_id")
      .parquet(vectorsDir(root))
    rows.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_appended"))
      .orderBy(col("cell_id"))
  }

  /** Post-append maintenance: A36 per-partition compaction of hot
    * cells via A26's health report — same contract as
    * [[IvfIndex.maintain]].
    */
  def maintain(spark: SparkSession,
      root: String): graft.etl.Compactor.Result =
    graft.etl.Compactor.compact(spark, vectorsDir(root), Some("cell_id"))

  /** Right-to-erasure surgery on the COMPRESSED index — E33's
    * ([[IndexErasure.eraseFromIndex]]) contract asked of the PQ
    * layout, closing the triad's GDPR hole (r14 verdict #2): before
    * this, a DSAR against the 32×-compressed production index had no
    * supported path short of a full rebuild. Victim rows leave the
    * codes table; the centroid AND codebook sidecars stay frozen
    * (E30's artifact-freeze discipline — survivors keep their cells
    * and their codes, so post-erasure retrieval is bit-equal to an
    * index rebuilt from the surviving corpus under the same sidecars,
    * spec-pinned). One pass marks victims per cell and materializes
    * the O(cells) report BEFORE any file moves; only touched
    * `cell_id=` partitions rewrite via dynamic partition overwrite
    * (untouched code lists keep their exact bytes — spec-pinned at
    * file level); fully-erased cells drop their directories
    * explicitly. Victims join hash-keyed on vec_id, never broadcast
    * (a DSAR list at 100 TB is not driver-sized).
    */
  def eraseFromIndex(spark: SparkSession, root: String,
      victims0: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val victims = victims0.select(col("vec_id")).distinct()
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val vecs = spark.read.parquet(vectorsDir(root))
      .withColumn("cell_id", col("cell_id").cast("long"))
    val report = vecs
      .join(victims.withColumn("erased", lit(1L)), Seq("vec_id"), "left")
      .groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_before"),
        sum(coalesce(col("erased"), lit(0L))).as("n_erased"))
      .withColumn("n_after", col("n_before") - col("n_erased"))
      .withColumn("erased_bp", expr("n_erased * 10000 div n_before"))
      .withColumn("rewrite_advised",
        (col("erased_bp") >= IndexErasure.RecompactBp).cast("int"))
      .select(col("cell_id"), col("n_before"), col("n_erased"),
        col("n_after"), col("erased_bp"), col("rewrite_advised"))
      .orderBy(col("cell_id"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val touched = report.filter(col("n_erased") > 0)
      .select(col("cell_id"), col("n_after")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    if (touched.nonEmpty) {
      // checkpoint survivors so the overwrite never reads the files
      // it replaces
      val keep = vecs
        .filter(col("cell_id").isin(touched.map(_._1): _*))
        .join(victims, Seq("vec_id"), "left_anti")
        .select(col("cell_id"), col("vec_id"), col("codes"))
        // cluster by the partition column BEFORE the checkpoint so the
        // rewrite's WriteFiles stage runs one task per hash bucket
        // instead of the one AQE-coalesced task the baseline measured
        .repartition(spark.sparkContext.defaultParallelism,
          col("cell_id"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      val conf = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(conf)
      spark.conf.set(conf, "dynamic")
      try keep.write.mode("overwrite").partitionBy("cell_id")
        .parquet(vectorsDir(root))
      finally prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None => spark.conf.unset(conf)
      }
      // dynamic overwrite can't replace a partition with NOTHING;
      // resolve the fs FROM the index root (E33's s3a/hdfs caveat)
      val fs = new org.apache.hadoop.fs.Path(vectorsDir(root))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.collect { case (cell, 0L) => cell }.foreach { cell =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${vectorsDir(root)}/cell_id=$cell"), true)
      }
    }
    report
  }

  /** Registered E33-for-PQ query: fresh E23 build under a scratch
    * root, the seeded cohort erased, the per-cell report returned
    * (build + surgery inside the benched region — the honest
    * maintenance cost, as ann_index_erasure).
    */
  def pqIndexErasure(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-ivfpq-erase",
      java.lang.Integer.toHexString(dir.hashCode)).toString
    build(spark, dir, root)
    eraseFromIndex(spark, root, IndexErasure.victimsOf(
      graft.Tables(spark, dir, "embeddings")))
  }

  /** Retrieve top-k against a built index; `dir` locates the primary
    * embeddings table the exact re-rank reads.
    */
  def query(spark: SparkSession, root: String, dir: String,
      queries: DataFrame): DataFrame = {
    val refined = spark.read.parquet(centroidsDir(root))
    val cb = spark.read.parquet(codebookDir(root))
    val q = queries.withColumn("qn", sqrt(dotF(col("q_emb"), col("q_emb"))))
    val lut = Ann.subvecFrame(q, "q_emb", "q_id")
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d", dotF(col("sv"), col("cb_emb")))
      .groupBy(col("q_id"))
      .agg(Ann.adcLutAgg.as("lut"))
    val probed = Ann.probeCells(q, refined).join(lut, Seq("q_id"))
    val cellIds = probed.select(col("cell_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val idx = spark.read.parquet(vectorsDir(root))
      .withColumn("cell_id", col("cell_id").cast("long"))
      .filter(col("cell_id").isin(cellIds: _*))
    val shortlist = Ann.poolTopK(
      idx.join(broadcast(probed), Seq("cell_id"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("adot", col("qc_dot") + Ann.adcSum)
        .withColumn("adot_r", round(col("adot"), 6)),
      orderBy = Seq("adot_r" -> false, "vec_id" -> true),
      k = Ann.IvfPqRerank)
      .select(col("q_id"), col("q_emb"), col("qn"), col("vec_id"))
    val emb = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val rr = shortlist.join(emb, Seq("vec_id"))
      .withColumn("nrm", sqrt(dotF(col("embedding"), col("embedding"))))
    Ann.topK(rr.withColumn("cos",
      when(col("nrm") * col("qn") === 0.0, 0.0)
        .otherwise(dotF(col("embedding"), col("q_emb")) /
          (col("nrm") * col("qn")))))
  }

  /** Registered query: build under a per-dataset scratch root, query
    * the standard set (build+query is the honest end-to-end cost; a
    * deployment builds once).
    */
  def annIvfPqIndexed(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-ivfpq-index",
      java.lang.Integer.toHexString(dir.hashCode)).toString
    build(spark, dir, root)
    query(spark, root, dir, Ann.queriesDf(spark, dir))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivfpq_indexed" -> (annIvfPqIndexed _),
    "pq_index_erasure" -> (pqIndexErasure _))

  /** ann_ivfpq_indexed is bit-identical to E11 end-to-end → its
    * oracle replays it. pq_index_erasure's report is a pure function
    * of (cell assignment, seeded cohort) — the codes never enter it —
    * and the PQ build's coarse assignment is the SAME
    * trainSample→refineLocal chain as E21's, so E33's oracle replays
    * this report verbatim.
    */
  val oracle: Map[String, String] = Map(
    "ann_ivfpq_indexed" -> Ann.oracle("ann_ivfpq"),
    "pq_index_erasure" -> IndexErasure.oracle("ann_index_erasure"))
}
