package graft

import org.apache.spark.sql.SparkSession

/** Determinism spot-probe for the r14 money-sum sweep (§5 lane): run
  * the named registry keys TWICE against the same dir — two separate
  * SparkSessions with DIFFERENT shuffle-partition counts, so partial
  * aggregates merge in genuinely different orders — and require
  * byte-identical collected results. This is the check the r13
  * agg_rollup incident demanded: a raw-double fact-table sum passes
  * any single run and flips between runs; an integer-cent sum cannot.
  *
  * Usage: BenchStability <dir> <key,key,...> [outFile]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object BenchStability {

  private def runWith(dir: String, keys: Seq[String], cpus: String,
      shuffle: Int): Map[String, Seq[String]] = {
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
    try keys.map { k =>
      val rows = SparkEntry.queries(k)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      k -> rows
    }.toMap
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keys = args(1).split(",").map(_.trim).toSeq
    val outFile =
      if (args.length > 2) args(2) else "BENCH_STABILITY.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // two shuffle geometries → different partial-merge orders; a
    // merge-order-dependent aggregate flips between these two runs
    val a = runWith(dir, keys, cpus, 7)
    val b = runWith(dir, keys, cpus, 32)
    val per = keys.map { k =>
      val same = a(k) == b(k)
      System.err.println(s"[stability] $k rows=${a(k).size} " +
        (if (same) "STABLE" else "UNSTABLE"))
      s""""$k":{"rows":${a(k).size},"stable":$same}"""
    }
    val allOk = keys.forall(k => a(k) == b(k))
    val json = s"""{"metric":"stability_probe","dir":"$dir",""" +
      s""""cpus":$cpus,"all_stable":$allOk,""" +
      s""""keys":${per.mkString("{", ",", "}")}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    if (!allOk) sys.exit(1)
  }
}
