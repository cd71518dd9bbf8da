package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line. A warmup pass (q1_agg) runs first so JVM /
  * codegen / shuffle-service warmup isn't billed to whichever query
  * happens to run first; queries run in sorted-name order and each is
  * timed twice with the min reported (standard guard against one-off
  * GC / co-tenant noise). Noise calibration (SURVEY §8g): two rounds
  * benched the IDENTICAL binary at 106.6 s vs 86.1 s total with
  * per-query swings up to 5× — so treat sub-2× per-query wall deltas
  * as co-tenant noise unless a named stage's task metrics moved; the
  * task-metric totals below are the scale-stable signal.
  *
  * A query that throws is reported as -1 (not its wall time) and named
  * in an "errors" object, so a crashing query can't masquerade as a
  * fast success in the bench total.
  *
  * Since round 9 each query materializes through its OWN physical plan
  * (`queryExecution.toRdd`), not a `count()` on top — count()
  * re-optimizes and legally deletes work (outer-join elimination,
  * aggregate/fingerprint column pruning, final-sort removal), so it
  * timed plans the user never runs. Totals from r9 on are therefore
  * NOT comparable to r8 and earlier; task-metric diffs across that
  * boundary show the previously-unmeasured work appearing, not
  * regressions.
  *
  * Beyond wall time, a SparkListener accumulates per-query task metrics
  * (shuffle read/write bytes, spill, input bytes, task count — the
  * numbers that predict cluster cost at 100 TB where wall time on a
  * noisy 32-core host doesn't). Reported per query under "metrics"
  * (second, warm run) and summed under "totals".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // house default (r14, probe-measured): lz4-compress RDD
      // cache/checkpoint blocks — the serialized lineage-truncation
      // checkpoints shrink ~4x with no measurable wall cost
      .config("spark.rdd.compress", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // H4/H7 live in the measured path: SQL kernels + the rank-filter →
    // bounded-heap TopK rewrite (safety net behind the explicit
    // TopKOps call sites; see SURVEY §2.H).
    graft.functions.GraftExtensions.registerSql(spark)
    graft.functions.GraftExtensions.registerOptimizations(spark)
    val metrics = BenchMetrics.install(spark.sparkContext)
    val warmupErr: Option[String] =
      try { SparkEntry.queries("q1_agg")(spark, sfDir).count(); None }
      catch { case t: Throwable => Some(t.toString.take(200)) }
    // (Right(seconds) on success / Left(error), task-metric delta,
    // per-stage records of this run).
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame):
        (Either[String, Double], BenchMetrics.Snap,
            Seq[BenchMetrics.StageRec]) = {
      metrics.drainStages(spark.sparkContext) // discard stale records
      val before = metrics.snapshot(spark.sparkContext)
      val t0 = System.nanoTime()
      val r =
        // materialize through the query's OWN physical plan
        // (queryExecution.toRdd), not df.count(): a count() on top
        // re-optimizes and legally DELETES work — outer joins to
        // unique-keyed aggregates are eliminated, fingerprint/agg
        // columns pruned, final sorts dropped — so count() times a
        // plan the user never runs (dedup_substring benched as 59
        // shuffle BYTES under count() vs its real corpus-wide window
        // shuffle; every md5-fingerprint assembly was skipped).
        // toRdd drains every operator of the declared plan exactly
        // once. Measurement-basis change in round 9 — totals are NOT
        // comparable to BENCH_r08 and earlier (see BENCHTREND_r09).
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Right((System.nanoTime() - t0) / 1e9)
        }
        catch { case t: Throwable => Left(t.toString.replaceAll("[\"\\n\\r]", " ").take(200)) }
        // queries that persist() intermediates (ann_pq, corpus_pipeline,
        // bpe_train, …) would otherwise leak cached frames into executor
        // storage for the remaining ~145 queries of the run; each timed
        // run builds (and pays for) its own caches, so dropping them
        // here keeps runs independent AND honest
        finally spark.catalog.clearCache()
      (r, metrics.snapshot(spark.sparkContext) - before,
        metrics.drainStages(spark.sparkContext))
    }
    // SPARK_GRAFT_ONLY=q1_agg,ann_topk restricts the run for local
    // iteration; unset (the driver's mode) runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(s =>
      SparkEntry.queries.filter(kv => s(kv._1)))
    // Each query's reported triple (wall, task metrics, stage records)
    // comes from ONE run — the faster of the two — so BENCH_DETAIL's
    // stage durations sum to ≈ the reported wall and hotspot ranking
    // never mixes a cold iteration's stages with a warm iteration's
    // wall (or vice versa). drainStages at each run's start resets the
    // queue, so records can't leak across runs either.
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      ((once(fn), once(fn)): @unchecked) match {
        case ((Right(a), m1, s1), (Right(b), m2, s2)) =>
          val (m, s) = if (a <= b) (m1, s1) else (m2, s2)
          (name, math.min(a, b), None, m, s)
        case ((r1, m1, s1), (r2, _, _)) =>
          (name, -1.0, r1.left.toOption.orElse(r2.left.toOption), m1, s1)
      }
    }
    def f3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val ms = results.map { case (k, _, _, m, _) => s"\"" + k + "\":" + m.json }
      .mkString("{", ",", "}")
    val stagesJson = results.map { case (k, _, _, _, s) =>
      s"\"" + k + "\":" + s.map(_.json).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val totalsJson = results.map(_._4)
      .foldLeft(BenchMetrics.Snap(0, 0, 0, 0, 0, 0))((a, b) =>
        BenchMetrics.Snap(a.shufRead + b.shufRead, a.shufWrite + b.shufWrite,
          a.spillMem + b.spillMem, a.spillDisk + b.spillDisk,
          a.input + b.input, a.tasks + b.tasks)).json
    val errs = results.collect { case (k, _, Some(e), _, _) => s"\"" + k + "\":\"" + e + "\"" } ++
      warmupErr.map(e => "\"_warmup\":\"" + e + "\"")
    val errJson = if (errs.isEmpty) "" else errs.mkString(",\"errors\":{", ",", "}")
    // Explicit top-level error COUNT in both output lines: a gate that
    // keys on exit code or only sees the compact tail line must not
    // read an errored sweep as green (round 6 had 41 analysis errors
    // behind rc 0 and a truncated tail).
    val nErrors = errs.size
    val total = results.map(_._2).filter(_ >= 0).sum
    // cpus rides along so cross-round task-count comparisons can tell
    // config changes from plan changes (benchtrend caveat, §8h)
    val detail =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_errors":$nErrors,"cpus":$cpus,"queries":$qs,"metrics":$ms,"stages":$stagesJson,"totals":$totalsJson$errJson,"sf":"$sfDir"}"""
    // The driver keeps only the last ~2000 chars of stdout and parses the
    // bench JSON out of that tail: the full detail line (~10 KB with 85+
    // queries) never fits, which is exactly how rounds 1–2 ended up with
    // BENCH parsed:null. So: full detail goes to a file + an early stdout
    // line, and the LAST line printed is a compact summary — true total
    // over all queries, per-query times for the slowest 24 only, the rest
    // summed under "other_sec" — sized to survive the tail with room for
    // stray shutdown noise.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"), detail + "\n")
    catch { case _: Throwable => () }
    println(detail)
    val bySlowest = results.sortBy { case (_, v, _, _, _) => -v }
    val (head, rest) = bySlowest.splitAt(24)
    val qsShort = head.sortBy(_._1).map { case (k, v, _, _, _) =>
      s"\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val otherSec = rest.map(_._2).filter(_ >= 0).sum
    // "queries_note" names the truncation IN the artifact so a reader
    // of BENCH_r{N}.json alone doesn't mistake the 24-entry map for
    // the whole run (r9 verdict's detour)
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qsShort,"queries_note":"slowest 24 of ${results.size}; full map in BENCH_DETAIL.json","n_queries":${results.size},"n_errors":$nErrors,"other_sec":${f3(otherSec)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
