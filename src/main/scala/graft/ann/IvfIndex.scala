package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

/** E21 `ann_ivf_indexed` — IVF retrieval against a MATERIALIZED on-disk
  * index: the layout a 100 TB vector store actually ships, where the
  * index is built once (train + assign + write) and every query batch
  * afterwards reads only the cells it probes.
  *
  * Build: the deterministic E3 training ([[Ann.refinedCentroids]] on
  * the bounded sample) + full-corpus cell assignment, vectors written
  * Hive-partitioned on `cell_id=` (one directory per inverted list)
  * plus a driver-sized centroid sidecar table. Query: probe selection
  * against the sidecar ([[Ann.probeCells]], identical multi-probe
  * rule), then a vectors scan filtered to the probed cells — the
  * filter is a literal IN-list over partition values, so it lands in
  * `PartitionFilters` and prunes at the DIRECTORY level: a 4-of-1000
  * cells probe reads 0.4% of the index bytes, no shuffle, no touch of
  * the unprobed 99.6%. That directory pruning is the entire point of
  * the IVF layout at scale — the non-indexed E3 re-reads and re-assigns
  * the whole corpus per query batch.
  *
  * The probe set is O(queries × [[Ann.IvfMaxProbes]]) cell ids,
  * distinct-bounded by the total cell count (≤ [[Ann.trainCapFor]](n) /
  * [[Ann.IvfSeedMod]]) — always driver-sized, so collecting it into
  * the IN-list never scales with the corpus.
  *
  * Results are identical to E3 `ann_ivf` by construction (same
  * training, same assignment, same probe rule, same exact scoring), so
  * the E3 oracle replays this query too — and the parity is also
  * pinned directly in IvfIndexSpec.
  */
object IvfIndex {

  /** Index layout under one root: the partitioned vector store plus
    * the centroid sidecar.
    */
  def vectorsDir(root: String): String = s"$root/vectors"
  def centroidsDir(root: String): String = s"$root/centroids"

  /** Train on the corpus at `dir` and materialize the index under
    * `root`. One corpus pass for the threshold count, one for the
    * training sample, one assign+write pass.
    */
  def build(spark: SparkSession, dir: String, root: String): Unit = {
    val c = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    writeIndex(spark, c, Ann.refinedCentroids(spark, c), root)
  }

  /** Materialize an index from a vector frame and an EXPLICIT centroid
    * frame — [[build]]'s write half, shared with the append-equivalence
    * spec (which rebuilds against the stored sidecar to prove
    * append ≡ rebuild bit-equal).
    */
  def writeIndex(spark: SparkSession, c: DataFrame,
      cents: DataFrame, root: String): Unit = {
    cents.coalesce(1).write.mode("overwrite").parquet(centroidsDir(root))
    // hash-cluster by the partition column before the partitioned
    // write: the assign pipeline is map-only off the scan, so its
    // write parallelism was the SCAN split count (one task on a
    // single-file corpus) and that one task opened every `cell_id=`
    // directory serially. Clustered, up to defaultParallelism tasks
    // write in parallel and each cell still lands in exactly one file.
    // Caveat (r15 ADVICE): the key is low-cardinality, so effective
    // parallelism is min(cores, distinct cells) and hash collisions
    // can stack cells on one task — fine while cells ∝ √n ≫ cores at
    // production scale; salt the key (at the cost of >1 file per
    // cell) only if cell skew ever shows up in the write stage.
    Ann.assignCells(c, cents)
      .select(col("cell_id"), col("vec_id"), col("embedding"))
      .repartition(c.sparkSession.sparkContext.defaultParallelism,
        col("cell_id"))
      .sortWithinPartitions(col("cell_id"), col("vec_id"))
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(vectorsDir(root))
  }

  /** Append a (vec_id, embedding) delta batch to a BUILT index without
    * retraining: assignment runs against the STORED centroid sidecar —
    * the artifact freeze that makes daily appends cheap AND
    * deterministic (a vector lands in the same cell no matter which
    * batch delivers it, so append ≡ rebuild-under-the-same-sidecar
    * bit-exactly — spec-pinned). The write appends files only under
    * the touched `cell_id=` partitions (A23's partition-is-the-unit
    * discipline; untouched inverted lists keep their bytes), and the
    * returned per-cell report is the A26-style signal the
    * [[maintain]] trigger reads. Each append adds one file per
    * touched cell; [[maintain]] folds them back.
    */
  def appendToIndex(spark: SparkSession, root: String,
      delta: DataFrame): DataFrame = {
    val cents = spark.read.parquet(centroidsDir(root))
    val assigned = Ann.assignCells(
      delta.select(col("vec_id"), col("embedding")), cents)
      .select(col("cell_id"), col("vec_id"), col("embedding"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER) // one assignment feeds the write AND the report
    assigned.write.mode("append").partitionBy("cell_id")
      .parquet(vectorsDir(root))
    assigned.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_appended"))
      .orderBy(col("cell_id"))
  }

  /** Maintenance pass after appends: compact the inverted lists whose
    * file layout went unhealthy — verbatim A36 ([[graft.etl.Compactor]]
    * per-partition rewrite, tmp-staged swap, row-conservation guard)
    * driven by A26's per-partition health report; hot cells fold their
    * append files back to target-sized ones, cold cells keep their
    * bytes untouched. Query results are unaffected by construction
    * (same rows, same values) — also spec-pinned.
    */
  def maintain(spark: SparkSession,
      root: String): graft.etl.Compactor.Result =
    graft.etl.Compactor.compact(spark, vectorsDir(root), Some("cell_id"))

  /** Retrieve top-k for a (q_id, q_emb) query frame against a built
    * index. The vectors scan carries the probed-cells IN-list as a
    * partition filter — only probed directories are read.
    */
  def query(spark: SparkSession, root: String, queries: DataFrame): DataFrame = {
    val cents = spark.read.parquet(centroidsDir(root))
    val probed = Ann.probeCells(queries, cents)
    val cellIds = probed.select(col("cell_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val vecs = spark.read.parquet(vectorsDir(root))
      .withColumn("cell_id", col("cell_id").cast("long"))
      .filter(col("cell_id").isin(cellIds: _*))
    val cand = vecs.join(broadcast(probed), Seq("cell_id"))
      .filter(col("vec_id") =!= col("q_id"))
    Ann.topK(cand.withColumn("cos",
      graft.functions.GraftFunctions.cosineSim(col("embedding"), col("q_emb"))))
  }

  /** The registered query: build under a per-dataset scratch root (a
    * real deployment builds once and queries many times; the bench
    * measuring build+query is the honest end-to-end index cost), then
    * retrieve for the standard query set.
    */
  def annIvfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-ivf-index",
      java.lang.Integer.toHexString(dir.hashCode)).toString
    build(spark, dir, root)
    query(spark, root, Ann.queriesDf(spark, dir))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivf_indexed" -> (annIvfIndexed _))

  /** Identical math to E3 end-to-end → the E3 oracle replays it. */
  val oracle: Map[String, String] = Map(
    "ann_ivf_indexed" -> Ann.oracle("ann_ivf"))
}
