package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-inspection main: dumps every registered query's formatted
  * physical plan to one markdown file — the artifact to eyeball for
  * pushdown / broadcast / shuffle regressions between rounds.
  *
  * Usage: `sbt "runMain graft.Explain [sfDir] [outFile]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      // house default (r14, probe-measured): lz4-compress RDD
      // cache/checkpoint blocks — the serialized lineage-truncation
      // checkpoints shrink ~4x with no measurable wall cost
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.registerSql(spark)
    graft.functions.GraftExtensions.registerOptimizations(spark)
    val sb = new StringBuilder(s"# graft query plans ($sfDir)\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        catch { case e: Throwable => s"FAILED: ${e.getMessage}" }
      sb.append(s"\n## $name\n\n```\n$plan\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
