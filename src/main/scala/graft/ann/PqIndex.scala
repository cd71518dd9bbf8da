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
    encodeFrame(c, refined, cb)
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(vectorsDir(root))
  }

  /** Assign + residual-encode a vector frame against EXPLICIT
    * quantizers → the (cell_id, vec_id, codes) at-rest rows.
    * [[build]]'s encode half, shared with [[appendToIndex]] (stored
    * sidecars in, identical codes out) and the equivalence spec.
    */
  private[ann] def encodeFrame(c: DataFrame, refined: DataFrame,
      cb: DataFrame): DataFrame = {
    val asg = residual(
      Ann.assignCells(c, refined).join(broadcast(refined), Seq("cell_id")))
    val sv = Ann.subvecFrame(
      asg.select(col("vec_id"), col("res").as("embedding")),
      "embedding", "vec_id")
    Ann.assignCodes(sv, cb)
      .groupBy(col("vec_id"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(sub, code))), x -> x.code)")
        .as("codes"))
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
      .localCheckpoint() // one encode feeds the write AND the report
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
      .agg(map_from_entries(collect_list(struct(
        (col("sub") * Ann.PqK + col("code")).as("idx"), col("d"))))
        .as("lut"))
    val probed = Ann.probeCells(q, refined).join(lut, Seq("q_id"))
    val cellIds = probed.select(col("cell_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val idx = spark.read.parquet(vectorsDir(root))
      .withColumn("cell_id", col("cell_id").cast("long"))
      .filter(col("cell_id").isin(cellIds: _*))
    val shortlist = Ann.poolTopK(
      idx.join(broadcast(probed), Seq("cell_id"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("adot", col("qc_dot") + expr(
          s"""aggregate(sequence(0, ${Ann.PqM - 1}), cast(0 as double),
             |  (acc, s) -> acc + element_at(lut,
             |    s * ${Ann.PqK} + element_at(codes, s + 1)))""".stripMargin))
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
    "ann_ivfpq_indexed" -> (annIvfPqIndexed _))

  /** Bit-identical to E11 end-to-end → its oracle replays this. */
  val oracle: Map[String, String] = Map(
    "ann_ivfpq_indexed" -> Ann.oracle("ann_ivfpq"))
}
