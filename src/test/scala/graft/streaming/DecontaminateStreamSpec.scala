package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, pmod, lit}

import graft.SparkSpec

/** G20 `DecontaminateStream` — the live fuzzy decontamination gate.
  * The load-bearing claims: stream ≡ registered batch arm on the sf
  * corpus, micro-batch boundaries cannot change any verdict
  * (stateless transform), and a planted paraphrase of an eval item is
  * flagged at intake while the eval text never leaves the driver
  * state.
  */
class DecontaminateStreamSpec extends SparkSpec {

  private def docsOf(dir: String) =
    graft.Tables(spark, dir, "documents").select(col("doc_id"), col("text"))

  private def run(st: DecontaminateStream.EvalState,
      batches: Seq[Seq[StreamDoc]], name: String)
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = DecontaminateStream.transform(mem.toDF(), st)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_candidates"),
          r.getAs[Long]("n_near_dups"), r.getAs[Long]("best_match_perms"),
          r.getAs[Long]("best_match_bp"))).toSet
    } finally q.stop()
  }

  test("sf corpus replay equals the registered stream_decontaminate " +
      "batch rows, 1-batch and 3-batch") {
    import spark.implicits._
    import graft.text.TextOps.ContamMod
    val batch = Streaming.streamDecontaminate(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_near_dups"), r.getAs[Long]("best_match_perms"),
        r.getAs[Long]("best_match_bp"))).toSet
    assert(batch.nonEmpty)
    val st = DecontaminateStream.evalState(
      docsOf(sfDir).filter(pmod(col("doc_id"), lit(ContamMod)) === 0))
    val intake = docsOf(sfDir)
      .filter(pmod(col("doc_id"), lit(ContamMod)) =!= 0)
      .as[(Long, String)].collect().sortBy(_._1)
      .map { case (i, t) => StreamDoc(i, t) }
    val one = run(st, Seq(intake.toSeq), "decon_one")
    assert(one == batch, "single-batch stream must equal the batch arm")
    val three = run(st, intake.grouped(170).map(_.toSeq).toSeq, "decon_three")
    assert(three == batch, "micro-batching must not change verdicts")
  }

  test("planted paraphrase of an eval item is flagged at intake; an " +
      "unrelated doc is not a near-dup") {
    import spark.implicits._
    val evalText = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong coffee beside the river bank today"
    val st = DecontaminateStream.evalState(
      Seq((100L, evalText)).toDF("doc_id", "text"))
    val out = run(st, Seq(Seq(
      StreamDoc(1L, evalText.replace("coffee", "tea")), // paraphrase
      StreamDoc(2L, evalText),                          // verbatim leak
      StreamDoc(3L, "entirely unrelated content about spark physical " +
        "plans and bounded heaps running on large clusters every day"))),
      "decon_plant")
      .map(t => t._1 -> t).toMap
    assert(out(2L)._4 == graft.dedup.Dedup.NumPerms.toLong)
    assert(out(2L)._3 >= 1L, "verbatim leak must be a near-dup")
    assert(out(1L)._3 >= 1L, s"paraphrase missed: ${out(1L)}")
    assert(out(3L)._3 == 0L, "unrelated doc must not clear the bar")
  }
}
