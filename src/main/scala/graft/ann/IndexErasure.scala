package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E33 `ann_index_erasure` — right-to-erasure maintenance for the
  * MATERIALIZED IVF index: A41 plans GDPR deletion against immutable
  * day-partitioned facts; this is the same Article-17 problem asked of
  * the vector store (E21's layout), where "delete these users'
  * embeddings" means REWRITING every inverted list that contains one —
  * and, critically, NOT retraining: the centroid sidecar stays frozen
  * (E30's artifact-freeze discipline), so surviving vectors keep their
  * cells and post-erasure retrieval is bit-equal to an index rebuilt
  * from the surviving corpus under the same sidecar (spec-pinned).
  *
  * The deletion cohort is the house seeded-draw contract (md5-u16 of
  * vec_id < [[EraseThresh]] ≈ 10%, A41's spelling — production swaps
  * one line for a DSAR table join). Execution is Spark-native
  * partition surgery: ONE pass marks victims per cell and aggregates
  * the O(cells) report (materialized BEFORE any file moves), then only
  * TOUCHED `cell_id=` partitions rewrite via dynamic partition
  * overwrite — untouched inverted lists keep their exact bytes
  * (spec-pinned at file level) — and fully-erased cells, which dynamic
  * overwrite cannot replace with nothing, drop their directories
  * explicitly. Per cell the report carries before/erased/after counts,
  * the erased share in exact floor basis points, and the
  * rewrite-advised flag (share ≥ [[RecompactBp]]) a maintenance
  * scheduler reads — A26's health-report pattern in index space.
  *
  * Scale shape: the report is one map-side-combined shuffle to the
  * O(cells) frame; the rewrite reads and writes only touched
  * partitions (at a 10% cohort that is most of them — exactly the
  * write-amplification story A41's amp_bp quantifies); the victim
  * frame joins hash-keyed on vec_id, never broadcast (a DSAR list at
  * 100 TB is not driver-sized). Oracle: the E3/E21 assignment replay
  * (asg1) + the u16-draw replay + one rollup.
  */
object IndexErasure {

  val EraseThresh = 6554L // md5-u16 cohort bound ≈ 10% of vectors
  val RecompactBp = 1000L // erased share that advises a compaction

  /** The deletion cohort of a corpus: seeded-draw victims. */
  private[ann] def victimsOf(c: DataFrame): DataFrame =
    c.filter(Ann.sampleDraw < EraseThresh).select(col("vec_id"))

  /** Erase `victims0` (a vec_id frame) from the index at `root`:
    * returns the per-cell report, leaves only touched partitions
    * rewritten.
    */
  def eraseFromIndex(spark: SparkSession, root: String,
      victims0: DataFrame): DataFrame = {
    val victims = victims0.select(col("vec_id")).localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val vecs = spark.read.parquet(IvfIndex.vectorsDir(root))
      .withColumn("cell_id", col("cell_id").cast("long"))
    // the report materializes BEFORE the rewrite mutates the files
    // it was computed from
    val report = vecs
      .join(victims.withColumn("erased", lit(1L)), Seq("vec_id"), "left")
      .groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_before"),
        sum(coalesce(col("erased"), lit(0L))).as("n_erased"))
      .withColumn("n_after", col("n_before") - col("n_erased"))
      .withColumn("erased_bp", expr("n_erased * 10000 div n_before"))
      .withColumn("rewrite_advised",
        (col("erased_bp") >= RecompactBp).cast("int"))
      .select(col("cell_id"), col("n_before"), col("n_erased"),
        col("n_after"), col("erased_bp"), col("rewrite_advised"))
      .orderBy(col("cell_id"))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val touched = report.filter(col("n_erased") > 0)
      .select(col("cell_id"), col("n_after")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    if (touched.nonEmpty) {
      // checkpoint the survivors so the overwrite doesn't read the
      // very files it replaces
      val keep = vecs
        .filter(col("cell_id").isin(touched.map(_._1): _*))
        .join(victims, Seq("vec_id"), "left_anti")
        .select(col("cell_id"), col("vec_id"), col("embedding"))
        // cluster by the partition column BEFORE the checkpoint so the
        // rewrite's WriteFiles stage runs one task per hash bucket
        // instead of one AQE-coalesced task; serialized storage per
        // the r14 house rule for re-read checkpoint frames
        .repartition(spark.sparkContext.defaultParallelism,
          col("cell_id"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val conf = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(conf)
      spark.conf.set(conf, "dynamic")
      try keep.write.mode("overwrite").partitionBy("cell_id")
        .parquet(IvfIndex.vectorsDir(root))
      finally prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None => spark.conf.unset(conf)
      }
      // dynamic overwrite can't replace a partition with NOTHING:
      // fully-erased cells drop their inverted list explicitly
      // resolve the filesystem FROM the index root (not the default
      // fs): with a local default and an s3a/hdfs root, a default-fs
      // delete would silently no-op and leave erased vectors readable
      val fs = new org.apache.hadoop.fs.Path(IvfIndex.vectorsDir(root))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.collect { case (cell, 0L) => cell }.foreach { cell =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${IvfIndex.vectorsDir(root)}/cell_id=$cell"), true)
      }
    }
    report
  }

  /** The registered query: fresh E21 build under a scratch root, the
    * seeded cohort erased, the per-cell report returned (build +
    * surgery both inside the benched region — the honest maintenance
    * cost).
    */
  def annIndexErasure(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-ivf-erase",
      java.lang.Integer.toHexString(dir.hashCode)).toString
    IvfIndex.build(spark, dir, root)
    eraseFromIndex(spark, root, victimsOf(
      graft.Tables(spark, dir, "embeddings")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_index_erasure" -> (annIndexErasure _))

  /** The u16 seeded-draw replay (smpCteOver's spelling at a fixed
    * threshold) over the E3/E21 assignment, one O(cells) rollup.
    */
  val oracle: Map[String, String] = Map(
    "ann_index_erasure" ->
      s"""${Ann.ivfOracleCommon},
         |dr AS (SELECT vec_id, cell_id,
         |    CAST((strpos('0123456789abcdef',
         |        substr(md5(CAST(vec_id AS VARCHAR)),1,1)) - 1) * 4096
         |      + (strpos('0123456789abcdef',
         |        substr(md5(CAST(vec_id AS VARCHAR)),2,1)) - 1) * 256
         |      + (strpos('0123456789abcdef',
         |        substr(md5(CAST(vec_id AS VARCHAR)),3,1)) - 1) * 16
         |      + (strpos('0123456789abcdef',
         |        substr(md5(CAST(vec_id AS VARCHAR)),4,1)) - 1) AS BIGINT)
         |      AS draw
         |  FROM asg1),
         |r AS (SELECT cell_id, count(*) AS n_before,
         |    CAST(sum(CASE WHEN draw < $EraseThresh THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_erased
         |  FROM dr GROUP BY cell_id)
         |SELECT cell_id, n_before, n_erased,
         |  CAST(n_before - n_erased AS BIGINT) AS n_after,
         |  n_erased * 10000 // n_before AS erased_bp,
         |  CAST(n_erased * 10000 // n_before >= $RecompactBp AS INT)
         |    AS rewrite_advised
         |FROM r ORDER BY cell_id""".stripMargin)
}
