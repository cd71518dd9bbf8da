package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class SubstringDedupStreamSpec extends SparkSpec {

  // the D12 planted corpus: doc 2 repeats doc 1's tokens 19..49 at a
  // shift that aligned segmentation misses; doc 3 is clean
  private val a = (0 until 60).map(i => s"a$i")
  private val docs = Seq(
    StreamDoc(1L, a.mkString(" ")),
    StreamDoc(2L, ((1 to 5).map(i => s"zz$i") ++ a.slice(19, 50)).mkString(" ")),
    StreamDoc(3L, (0 until 30).map(i => s"u$i").mkString(" ")))

  /** Batch keep-first reference: all window occurrences grouped by
    * hash, min (doc_id, pos) claims, the rest are dups.
    */
  private def batchRef(ds: Seq[StreamDoc]): Set[(Long, Long, Int, Long, Int)] = {
    val occ = ds.flatMap { d =>
      val hs = graft.functions.VecOps.rollingWinHashes(
        UTF8String.fromString(d.text), SubstringDedupStream.W)
      (0 until hs.numElements()).map(i => (hs.getLong(i), d.doc_id, i))
    }
    occ.groupBy(_._1).toSeq.flatMap { case (wh, os) =>
      val sorted = os.sortBy(o => (o._2, o._3))
      val first = sorted.head
      sorted.tail.map(o => (wh, o._2, o._3, first._2, first._3))
    }.toSet
  }

  private def run(batches: Seq[Seq[StreamDoc]]): Set[(Long, Long, Int, Long, Int)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val name = s"subdup${batches.map(_.size).mkString("_")}"
    val q = SubstringDedupStream.pipeline(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getAs[Long]("wh"), r.getAs[Long]("doc_id"),
          r.getAs[Int]("pos"), r.getAs[Long]("first_doc"),
          r.getAs[Int]("first_pos"))).toSet
    } finally q.stop()
  }

  test("stream dup witnesses == the batch keep-first rule, and the " +
      "micro-batch split does not change the output") {
    val want = batchRef(docs)
    assert(want.nonEmpty, "planted overlap must produce dup windows")
    // doc 2's shifted 31-token run: 16 dup windows, all claimed by doc 1
    assert(want.size == 16)
    assert(want.forall { case (_, d, _, fd, _) => d == 2L && fd == 1L })
    val oneBatch = run(Seq(docs))
    val threeBatches = run(docs.map(Seq(_)))
    assert(oneBatch == want, "single-batch stream must equal batch ref")
    assert(threeBatches == want, "batching must not change the witnesses")
  }

  test("replaying the sf corpus through the stream reproduces the " +
      "registered stream_substring_dedup batch query exactly") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1).map { case (i, t) => StreamDoc(i, t) }
    val mem = MemoryStream[StreamDoc]
    val q = SubstringDedupStream.pipeline(mem.toDS())
      .writeStream.format("memory").queryName("subdup_corpus")
      .outputMode("append").start()
    val streamed =
      try {
        corpus.grouped(17).foreach { b =>
          mem.addData(b.toSeq: _*); q.processAllAvailable()
        }
        spark.sql(
          "SELECT doc_id, count(*) AS c FROM subdup_corpus GROUP BY doc_id")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally q.stop()
    val batch = Streaming.streamSubstringDedup(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_keepfirst"))
      .filter(_._2 > 0).toMap
    assert(batch.nonEmpty, "sf corpus must contain keep-first dups")
    assert(streamed == batch,
      "per-doc stream witness counts must equal the batch query")
  }

  test("TTL arm: claims age out on EVENT time after the last sighting; " +
      "a post-expiry repeat re-claims instead of witnessing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // day-1 base: an epoch-0 event time would equal the INITIAL
    // watermark (0) and be dropped as late before ever reaching state
    def t(min: Int) = new java.sql.Timestamp((1440 + min) * 60L * 1000)
    val run = (0 until 16).map(i => s"w$i").mkString(" ")
    val other = (0 until 16).map(i => s"z$i").mkString(" ")
    val mem = MemoryStream[TsDoc]
    val q = SubstringDedupStream.pipelineTtl(mem.toDS())
      .writeStream.format("memory").queryName("subdup_ttl")
      .outputMode("append").start()
    try {
      def dups() = spark.sql("SELECT doc_id FROM subdup_ttl")
        .collect().map(_.getLong(0)).toSeq.sorted
      // minute 0: doc 1 claims the run's single window
      mem.addData(TsDoc(1L, t(0), run)); q.processAllAvailable()
      // minute 5 (inside the 10-min TTL): doc 2 repeats -> witness,
      // and the sighting refreshes the claim's clock
      mem.addData(TsDoc(2L, t(5), run)); q.processAllAvailable()
      assert(dups() == Seq(2L))
      // minute 40: unrelated traffic advances the watermark far past
      // the refreshed expiry (5 + 10 = minute 15) -> claim removed
      mem.addData(TsDoc(50L, t(40), other)); q.processAllAvailable()
      mem.addData(TsDoc(51L, t(41),
        (0 until 16).map(i => s"y$i").mkString(" "))); q.processAllAvailable()
      // minute 42: doc 3 repeats the run AFTER expiry -> re-claims,
      // no witness; minute 43: doc 4 repeats -> witnesses doc 3
      mem.addData(TsDoc(3L, t(42), run)); q.processAllAvailable()
      assert(dups() == Seq(2L), "post-expiry repeat must re-claim")
      mem.addData(TsDoc(4L, t(43), run)); q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, first_doc FROM subdup_ttl ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((2L, 1L), (4L, 3L)),
        s"doc 4 must witness the NEW claimant (doc 3), got $rows")
    } finally q.stop()
  }

  test("intra-batch claims follow the (doc_id, pos) tiebreak and an " +
      "intra-doc repeat witnesses its own earlier span") {
    val run20 = (0 until 20).map(i => s"r$i")
    val rep = Seq(StreamDoc(7L, (run20 ++ run20).mkString(" ")))
    val got = run(Seq(rep))
    // the 5 second-period windows repeat the 5 first-period ones
    assert(got == batchRef(rep))
    assert(got.size == 5)
    got.foreach { case (_, d, pos, fd, fpos) =>
      assert(d == 7L && fd == 7L && pos == fpos + 20)
    }
  }
}
