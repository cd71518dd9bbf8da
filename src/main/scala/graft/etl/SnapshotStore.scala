package graft.etl

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A10 `SnapshotStore` — versioned parquet snapshots with rotation
  * (≈ the reference's Today.xlsx / Yesterday.xlsx pair, aiesec.py:20-21,
  * generalized to N retained versions of a keyed dataset).
  *
  * Layout: `root/v=<version>/` parquet per snapshot. Versions are
  * caller-supplied sortable strings (dates, run ids). Deltas between
  * versions are anti / full-outer joins on the snapshot key — one
  * shuffle, linear in snapshot size, no driver-side row handling.
  */
object SnapshotStore {
  /** Trailing dot-extension, the marker of a non-parquet snapshot
    * medium. Version ids are dates ("2026-08-10"), which never carry
    * one, so the bare-suffix parquet store can exclude ANY foreign
    * medium — registered or not — without a central suffix registry.
    */
  private[etl] val DotExtension = "\\.[A-Za-z0-9]+$".r
}

class SnapshotStore(spark: SparkSession, root: String, key: String) {

  /** Filename suffix of one snapshot ("" = parquet directory). */
  protected def suffix: String = ""

  protected def dir(version: String) = s"$root/v=$version$suffix"

  def write(df: DataFrame, version: String): Unit =
    df.write.mode("overwrite").parquet(dir(version))

  /** Sorted ascending — last is the latest. Only entries in THIS
    * store's medium are listed: an entry's medium is its recognized
    * filename suffix ("" = parquet directory), so a root holding both
    * xlsx and parquet snapshots mid-migration (docs/SCHEDULING.md)
    * never leaks a `.xlsx` file into the parquet store's version list
    * (where `read` would crash on it) or vice versa.
    */
  def versions: Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      // medium classification without a central registry: a store
      // with a real suffix owns exactly the entries ending in it; the
      // bare-suffix parquet store owns entries with NO trailing
      // dot-extension (version ids are dates — a dot-extension can
      // only be another medium's marker, known to us or not)
      def mine(version: String): Boolean =
        if (suffix.nonEmpty) version.endsWith(suffix)
        else SnapshotStore.DotExtension.findFirstIn(version).isEmpty
      fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("v=") && mine(n))
        .map(_.stripPrefix("v=").stripSuffix(suffix)).sorted
    }
  }

  def read(version: String): DataFrame = spark.read.parquet(dir(version))

  def latest: Option[DataFrame] = versions.lastOption.map(read)
  def previous: Option[DataFrame] =
    versions.dropRight(1).lastOption.map(read)

  /** Keep only the newest `n` snapshots (the reference keeps two). */
  def retain(n: Int): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions.dropRight(n).foreach(v => fs.delete(new Path(dir(v)), true))
  }

  /** Rotate in a new snapshot: write it, keep this + the prior one. */
  def rotate(df: DataFrame, version: String): Unit = {
    write(df, version)
    retain(2)
  }

  /** Rows of the latest snapshot whose key is absent from the previous
    * one (≈ New.xlsx, aiesec.py:142-144). Empty previous → everything
    * is new.
    */
  def newRows: DataFrame = (latest, previous) match {
    case (Some(t), Some(y)) =>
      t.join(y.select(col(key)), Seq(key), "left_anti")
    case (Some(t), None) => t
    case _ =>
      spark.emptyDataFrame
  }

  /** Full-outer compare of latest vs previous keyed rows → one row per
    * key with status added / removed / changed / unchanged (changed =
    * any non-key column differs; null-safe comparison).
    */
  def diff: DataFrame = (latest, previous) match {
    case (Some(t), Some(y)) =>
      val valCols = t.columns.filter(_ != key).toSeq
      val tt = valCols.foldLeft(t)((d, c) => d.withColumnRenamed(c, s"new_$c"))
      val yy = valCols.foldLeft(y)((d, c) => d.withColumnRenamed(c, s"old_$c"))
        .withColumnRenamed(key, "__oldkey")
      val same = valCols.map(c => col(s"new_$c") <=> col(s"old_$c"))
        .reduceOption(_ && _).getOrElse(lit(true))
      tt.join(yy, col(key) === col("__oldkey"), "full_outer")
        .withColumn("status",
          when(col("__oldkey").isNull, "added")
            .when(col(key).isNull, "removed")
            .when(same, "unchanged")
            .otherwise("changed"))
        .withColumn(key, coalesce(col(key), col("__oldkey")))
        .drop("__oldkey")
    case (Some(t), None) => t.withColumn("status", lit("added"))
    case _ => spark.emptyDataFrame
  }
}

/** [[SnapshotStore]] persisted as .xlsx files (`root/v=<version>.xlsx`)
  * via the `graft-xlsx` DSv2 source — byte-for-byte the reference's
  * snapshot medium (Today.xlsx / Yesterday.xlsx, aiesec.py:20-21,131,
  * 137), so a user migrating mid-cycle can point graft at their
  * EXISTING xlsx snapshots and the delta logic keeps working. Read-back
  * schema is inferred (narrowest type per column); deltas compare
  * snapshot-to-snapshot, both sides inferred identically. Parquet
  * (the base class) remains the right medium once migration is done —
  * xlsx trades scale for reference-compat, which is the point here.
  */
class XlsxSnapshotStore(spark: SparkSession, root: String, key: String)
    extends SnapshotStore(spark, root, key) {

  override protected def suffix: String = ".xlsx"

  override def write(df: DataFrame, version: String): Unit = {
    new java.io.File(root).mkdirs()
    df.write.format("graft-xlsx").mode("overwrite").save(dir(version))
  }

  override def read(version: String): DataFrame =
    spark.read.format("graft-xlsx").load(dir(version))
}
