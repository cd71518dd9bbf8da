package graft

import org.apache.spark.sql.SparkSession

import graft.etl.{AlertSink, DailyPipeline, DirectoryAlertSink, SmtpAlertSink}

/** Runnable entrypoint for the daily job — the one-command form a
  * scheduler invokes (the reference runs on a daily cron,
  * `.github/workflows/main.yml:5`; see docs/SCHEDULING.md for cron /
  * Airflow / spark-submit recipes).
  *
  * {{{
  * spark-submit --class graft.Main graft.jar \
  *   <cardsDir> <storeRoot> <version> <reportDir> \
  *   [--xlsx-snapshots] [--alert-dir DIR | --smtp host:port:from:to[,to…]]
  * }}}
  *
  * Exit code 0 with a one-line JSON summary on stdout; non-zero on any
  * failure (so cron/Airflow retries fire). Scheduling stays OUTSIDE
  * the job on purpose — same contract as the reference.
  */
object Main {

  /** Parse the CLI sink flags (split out for spec coverage). */
  private[graft] def parseSink(args: Array[String]): AlertSink = {
    def optValue(flag: String): Option[String] = {
      val i = args.indexOf(flag)
      if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }
    optValue("--alert-dir")
      .map(new DirectoryAlertSink(_))
      .orElse(optValue("--smtp").map { spec =>
        spec.split(":") match {
          case Array(host, port, from, tos) =>
            new SmtpAlertSink(host, port.toInt, from, tos.split(",").toSeq)
          case _ => throw new IllegalArgumentException(
            s"--smtp expects host:port:from:to[,to…], got '$spec'")
        }
      })
      .getOrElse(AlertSink.Noop)
  }

  /** The job body against a provided session — what `main` wraps and
    * what specs call (they own their session's lifecycle).
    */
  private[graft] def run(spark: SparkSession, args: Array[String]): String = {
    val positional = args.filterNot(_.startsWith("--"))
      // values of flag options are also non-positional
      .filterNot(v => Seq("--alert-dir", "--smtp").exists { f =>
        val i = args.indexOf(f)
        i >= 0 && i + 1 < args.length && args(i + 1) == v
      })
    require(positional.length == 4,
      "usage: graft.Main <cardsDir> <storeRoot> <version> <reportDir> " +
        "[--xlsx-snapshots] [--alert-dir DIR | --smtp host:port:from:to[,to…]]")
    val Array(cardsDir, storeRoot, version, reportDir) = positional
    val r = DailyPipeline.run(spark, cardsDir, storeRoot, version,
      reportDir, xlsxSnapshots = args.contains("--xlsx-snapshots"),
      alertSink = parseSink(args))
    s"""{"version":${jstr(version)},"n_today":${r.nToday},""" +
      s""""n_new":${r.nNew},"alerted":${r.alert.isDefined},""" +
      s""""today_report":${jstr(r.todayReport)}}"""
  }

  /** JSON string literal with full escaping (quote, backslash, control
    * chars) — a version or path containing `"` or `\` must still yield
    * parseable summary JSON for whatever cron wrapper reads it.
    */
  private[graft] def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-daily")
      // run standalone on a workstation; a cluster submit overrides
      // master/shuffle settings on the spark-submit line
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // house default (r14, probe-measured): lz4-compress RDD
      // cache/checkpoint blocks — the serialized lineage-truncation
      // checkpoints shrink ~4x with no measurable wall cost
      .config("spark.rdd.compress", "true")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .getOrCreate()
    graft.functions.GraftExtensions.registerSql(spark)
    graft.functions.GraftExtensions.registerOptimizations(spark)
    try println(run(spark, args))
    finally spark.stop()
  }
}
