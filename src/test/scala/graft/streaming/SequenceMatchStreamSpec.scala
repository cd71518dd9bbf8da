package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SequenceMatchStreamSpec extends SparkSpec {

  /** The sf events as an in-order intake log (the key-partitioned-log
    * delivery contract).
    */
  private lazy val corpus: Array[SeqEvent] = {
    import spark.implicits._
    graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)]
      .collect()
      .sortBy(e => (SequenceMatchStream.micros(e._2), e._3))
      .map { case (u, t, i, k) => SeqEvent(u, t, i, k) }
  }

  private def run(batches: Seq[Seq[SeqEvent]], name: String)
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = SequenceMatchStream.matches(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.sql(s"SELECT * FROM $name").collect().map { r =>
        def us(c: String) =
          SequenceMatchStream.micros(r.getAs[Timestamp](c))
        (r.getAs[Long]("user_id"), us("view_ts"), us("click_ts"),
          us("purchase_ts"), r.getAs[Long]("span_sec"))
      }.toSet
    } finally q.stop()
  }

  test("ordered replay of the sf corpus emits exactly the registered " +
      "stream_sequence_match batch instances, invariant under the " +
      "micro-batch split") {
    val batch = Streaming.streamSequenceMatch(spark, sfDir).collect()
      .map { r =>
        def us(c: String) =
          SequenceMatchStream.micros(r.getAs[Timestamp](c))
        (r.getAs[Long]("user_id"), us("view_ts"), us("click_ts"),
          us("purchase_ts"), r.getAs[Long]("span_sec"))
      }.toSet
    assert(batch.nonEmpty, "sf corpus must contain pattern instances")
    assert(run(Seq(corpus.toSeq), "seqm_one") == batch,
      "single-batch stream must equal the batch arm")
    assert(run(corpus.grouped(corpus.length / 3 + 1).map(_.toSeq).toSeq,
      "seqm_three") == batch,
      "the carries are a left fold — batching must not change instances")
  }

  test("carries survive batch boundaries: view and click in one batch " +
      "anchor a purchase arriving two batches later; a cross-batch " +
      "error poisons only spans it falls inside") {
    def ev(u: Long, sec: Long, t: String, id: Long) =
      SeqEvent(u, new Timestamp(1704067200000L + sec * 1000L), id, t)
    val out = run(Seq(
      Seq(ev(1, 10, "view", 1), ev(1, 20, "click", 2),
        ev(2, 10, "view", 10), ev(2, 20, "click", 11)),
      Seq(ev(2, 25, "error", 12)),
      Seq(ev(1, 40, "purchase", 3), ev(2, 40, "purchase", 13),
        // user 2 recovers with a fresh pair after the error
        ev(2, 50, "view", 14), ev(2, 60, "click", 15),
        ev(2, 70, "purchase", 16))), "seqm_state")
    val base = 1704067200000000L
    assert(out == Set(
      (1L, base + 10000000L, base + 20000000L, base + 40000000L, 30L),
      (2L, base + 50000000L, base + 60000000L, base + 70000000L, 20L)),
      s"got $out")
  }
}
