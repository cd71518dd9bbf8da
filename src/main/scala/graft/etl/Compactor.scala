package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A36 `Compactor` — executes the maintenance [[TableStats]]
  * recommends: rewrite a parquet dataset's small files into
  * size-targeted ones without changing a single row. The small-file
  * problem is THE silent scan killer at 100 TB (per-file open/footer
  * cost dwarfs the read once thousands of KB-files accumulate — the
  * reason every table format ships an OPTIMIZE command); this is that
  * command for plain parquet layouts.
  *
  * Mechanics:
  *  - Unpartitioned: one pass, `repartition(ceil(bytes / target))` →
  *    even target-sized files.
  *  - Hive-partitioned (`col=value` directories): each partition
  *    compacts INDEPENDENTLY (a partition is the rewrite unit exactly
  *    as in [[Backfill]] — same dynamic-overwrite idempotence), and
  *    only partitions whose file layout is actually unhealthy
  *    ([[TableStats.report]] on the partition directory recommends
  *    compaction) are rewritten — a table with one hot partition
  *    doesn't pay a full-table rewrite. Untouched partitions keep
  *    their files byte-identical.
  *
  * Safety: the rewrite stages into `_compact_tmp` next to the target
  * and only then swaps directories, so a failed job never leaves a
  * partition half-rewritten; row-count conservation is checked before
  * the swap and the swap is refused on mismatch.
  */
object Compactor {

  final case class Result(
      partitionsSeen: Int, partitionsCompacted: Int,
      filesBefore: Long, filesAfter: Long, rows: Long)

  /** Target output file size. Matches [[ShardedWriter]]'s default so
    * compacted and freshly-sharded tables look alike on disk.
    */
  val TargetBytes: Long = 128L * 1024 * 1024

  /** Compact one directory of parquet files (no partition columns) in
    * place. Returns (filesBefore, filesAfter, rows).
    */
  private def compactLeaf(spark: SparkSession, dir: String): (Long, Long, Long) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val before = files.size.toLong
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nOut = math.max(1L, (bytes + TargetBytes - 1) / TargetBytes).toInt
    val old = new Path(dir)
    // underscore-prefixed SIBLINGS: invisible to Spark partition
    // discovery (and to the partition listing in compact()), so a
    // crashed run's leftovers can never masquerade as data
    val tmp = new Path(old.getParent, s"_compact_tmp_${old.getName}")
    fs.delete(tmp, true)
    df.repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    val rewritten = spark.read.parquet(tmp.toString).count()
    require(rewritten == rows,
      s"Compactor: row count changed ($rows -> $rewritten) under $dir; refusing swap")
    val bak = new Path(old.getParent, s"_compact_old_${old.getName}")
    fs.delete(bak, true)
    require(fs.rename(old, bak), s"Compactor: cannot stage $dir aside")
    require(fs.rename(tmp, old), s"Compactor: cannot swap compacted $dir in")
    fs.delete(bak, true)
    val after = fs.listStatus(old).count(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
    (before, after, rows)
  }

  /** Compact `root`. For a Hive-partitioned layout pass the partition
    * column; only unhealthy partitions are rewritten.
    */
  def compact(spark: SparkSession, root: String,
      partitionCol: Option[String] = None): Result = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    partitionCol match {
      case None =>
        val (b, a, r) = compactLeaf(spark, root)
        Result(1, 1, b, a, r)
      case Some(pc) =>
        val parts = fs.listStatus(new Path(root)).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$pc="))
          .map(_.getPath.toString).sorted
        var compacted = 0
        var fb = 0L; var fa = 0L; var rows = 0L
        parts.foreach { p =>
          val rep = TableStats.report(spark, p)
          rows += rep.totalRows
          if (rep.recommendCompact) {
            val (b, a, _) = compactLeaf(spark, p)
            compacted += 1; fb += b; fa += a
          } else {
            fb += rep.nFiles; fa += rep.nFiles
          }
        }
        Result(parts.size, compacted, fb, fa, rows)
    }
  }
}
