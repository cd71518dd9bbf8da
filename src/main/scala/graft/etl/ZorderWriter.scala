package graft.etl

import java.io.File

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.zValue

/** A21 `ZorderWriter` — multi-dimensional data layout: writes parquet
  * clustered on the Morton (Z-order) curve of two columns, so min/max
  * footer stats prune files for predicates on EITHER column — the
  * lakehouse answer to "sorted by one key helps one query, hurts the
  * other".
  *
  * Mechanics: ONE `approxQuantile` pass sketches both dimensions into
  * [[Buckets]] rank-based cut points (rank-based, so skewed value
  * distributions still fill the grid evenly); each row's bucket pair
  * is found with a branch-free fold over the broadcast cut points and
  * interleaved by the codegen `z_value` expression;
  * `repartitionByRange` on the z-key makes every output file a
  * contiguous z-range. At 100 TB the layout costs one sketch pass plus
  * the write shuffle; every later scan with a selective predicate on
  * either dimension prunes to ~√(selectivity) of the files instead of
  * reading all of them.
  */
object ZorderWriter {

  val Buckets = 256 // per-dimension grid resolution (8 bits × 2 dims)

  /** Bucket index of `c` in [0, Buckets) given ascending cut points:
    * counts boundaries ≤ value with a codegen'd HOF fold — no UDF, no
    * per-row driver work, cut points ride along as a literal array.
    */
  private def bucketOf(c: Column, cuts: Array[Double]): Column =
    aggregate(
      lit(cuts),
      lit(0L),
      (acc, b) => acc + when(c.cast("double") >= b, 1L).otherwise(0L))

  /** Writes `df` z-ordered on (dimA, dimB) into `files` files under
    * `path`; returns the parquet file count. Both dims must be numeric.
    */
  def write(df: DataFrame, path: String, dimA: String, dimB: String,
      files: Int): Int = {
    require(files > 0, "ZorderWriter: files must be positive")
    // one sketch pass for both dims: interior cut points at 1/Buckets
    // rank steps (GK sketch, driver gets 2 × 255 doubles)
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    val Array(cutsA, cutsB) =
      df.stat.approxQuantile(Array(dimA, dimB), probs, 0.001)
    val ranked = df.withColumn("__z",
      zValue(bucketOf(col(dimA), cutsA), bucketOf(col(dimB), cutsB)))
    ranked
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    Option(new File(path).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)
  }
}
