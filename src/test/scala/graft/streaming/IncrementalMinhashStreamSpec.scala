package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.SparkSpec

/** G21 `IncrementalMinhashStream` — D19's paraphrase gate live over a
  * persisted store. Load-bearing claims: stream ≡ the oracled D19
  * batch arm on the sf corpus, micro-batch boundaries cannot change
  * verdicts while the store is frozen, append ≡ rebuild on the
  * sidecars, a planted paraphrase is caught at intake ACROSS a batch
  * boundary (the novel original appended by batch N flags its
  * paraphrase in batch N+1), and maintain compacts without changing
  * a single verdict.
  */
class IncrementalMinhashStreamSpec extends SparkSpec {

  private def docsOf(dir: String) =
    graft.Tables(spark, dir, "documents").select(col("doc_id"), col("text"))

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-incmh-$tag")
      .resolve("store").toString

  private def verdictSet(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_near_dups"), r.getAs[Long]("best_match_perms"),
        r.getAs[Long]("best_match_bp"))).toSet

  /** Drive batches through [[IncrementalMinhashStream.gate]],
    * collecting every batch's verdict rows.
    */
  private def run(root: String, batches: Seq[Seq[StreamDoc]],
      appendNovel: Boolean): Set[(Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamDoc]
    val seen = scala.collection.mutable.Set
      .empty[(Long, Long, Long, Long, Long)]
    val q = IncrementalMinhashStream.gate(mem.toDF(), root,
      (v, _) => seen ++= verdictSet(v), appendNovel)
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      seen.toSet
    } finally q.stop()
  }

  test("sf corpus replay equals the oracled dedup_incremental_minhash " +
      "batch rows, 1-batch and 3-batch (store frozen)") {
    import graft.dedup.Dedup.IncMod
    import spark.implicits._
    // the D19 batch arm left-joins back to ALL intake docs (0-filled
    // verdicts for shingle-less docs); the stream emits only docs that
    // banded — compare on the banded subset plus explicit 0-fill check
    val batch = graft.dedup.Dedup.dedupIncrementalMinhash(spark, sfDir)
    val batchSet = verdictSet(batch)
    assert(batchSet.nonEmpty)
    val root = freshRoot("replay")
    IncrementalMinhashStream.build(spark,
      docsOf(sfDir).filter(pmod(col("doc_id"), lit(IncMod)) =!= 0), root)
    val intake = docsOf(sfDir)
      .filter(pmod(col("doc_id"), lit(IncMod)) === 0)
      .as[(Long, String)].collect().sortBy(_._1)
      .map { case (i, t) => StreamDoc(i, t) }
    val streamed = run(root, Seq(intake.toSeq), appendNovel = false)
    // every streamed verdict is the batch arm's row for that doc
    assert(streamed.subsetOf(batchSet),
      s"stream rows diverge: ${streamed.diff(batchSet).take(3)}")
    // docs the stream skipped are exactly the batch arm's 0-fills
    // (no shingles → nothing to band)
    val skipped = batchSet.filterNot(r => streamed.exists(_._1 == r._1))
    assert(skipped.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L),
      s"skipped docs must be the 0-filled ones: ${skipped.take(3)}")
    val root3 = freshRoot("replay3")
    IncrementalMinhashStream.build(spark,
      docsOf(sfDir).filter(pmod(col("doc_id"), lit(IncMod)) =!= 0), root3)
    val three = run(root3, intake.grouped(50).map(_.toSeq).toSeq,
      appendNovel = false)
    assert(three == streamed, "micro-batching must not change verdicts")
  }

  test("planted paraphrase is caught at intake ACROSS a batch " +
      "boundary: batch 1 accepts the novel original into the store, " +
      "batch 2 flags its paraphrase") {
    import spark.implicits._
    val original = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong coffee beside the river bank today " +
      "and the caravan rests under tall cedars until the storm passes"
    val root = freshRoot("plant")
    IncrementalMinhashStream.build(spark,
      Seq((9000L, "completely different seed content about bounded " +
        "heaps shuffle partitions and physical plans on large clusters"))
        .toDF("doc_id", "text"), root)
    val out = run(root, Seq(
      Seq(StreamDoc(1L, original)),
      Seq(StreamDoc(2L, original.replace("coffee", "tea")), // paraphrase
        StreamDoc(3L, "unrelated prose concerning parquet row groups " +
          "column pruning and broadcast joins at one hundred terabytes"))),
      appendNovel = true).map(t => t._1 -> t).toMap
    assert(out(1L)._3 == 0L, s"original must be novel: ${out(1L)}")
    assert(out(2L)._3 >= 1L,
      s"paraphrase missed across the batch boundary: ${out(2L)}")
    assert(out(3L)._3 == 0L, "unrelated doc must not clear the bar")
  }

  test("append ≡ rebuild on the sidecars, and maintain compacts " +
      "without changing a verdict") {
    import graft.dedup.Dedup.IncMod
    import spark.implicits._
    val store = docsOf(sfDir)
      .filter(pmod(col("doc_id"), lit(IncMod)) =!= 0)
    val delta = store.orderBy(col("doc_id")).limit(20)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val rootA = freshRoot("append")
    IncrementalMinhashStream.build(spark, store, rootA)
    val report = IncrementalMinhashStream
      .appendToState(spark, rootA, delta)
    assert(report.agg(org.apache.spark.sql.functions.sum("n_appended"))
      .collect()(0).getLong(0) > 0L)
    val rootB = freshRoot("rebuild")
    IncrementalMinhashStream.build(spark, store.unionByName(delta), rootB)
    def dump(root: String) = {
      val (b, s) = IncrementalMinhashStream.sidecars(spark, root)
      (b.collect().map(r => (r.getAs[Int]("band"),
          r.getAs[scala.collection.Seq[Long]]("bucket").toList,
          r.getAs[Long]("sid"))).toSet,
        s.collect().map(r => (r.getAs[Long]("sid"),
          r.getAs[scala.collection.Seq[Long]]("ssig").toList)).toSet)
    }
    assert(dump(rootA) == dump(rootB), "append must equal rebuild")
    val intake = docsOf(sfDir)
      .filter(pmod(col("doc_id"), lit(IncMod)) === 0).limit(50)
    val before = verdictSet(
      IncrementalMinhashStream.transformBatch(intake, rootA))
    val bandRows = IncrementalMinhashStream.sidecars(spark, rootA)
      ._1.count()
    val res = IncrementalMinhashStream.maintain(spark, rootA)
    assert(res.rows == bandRows, "maintain must conserve band rows")
    val after = verdictSet(
      IncrementalMinhashStream.transformBatch(intake, rootA))
    assert(after == before, "maintain must not change verdicts")
  }

  test("removeFromState: erased docs stop matching intake, erase ≡ " +
      "rebuild-from-survivors on both sidecars, report counts exact") {
    import spark.implicits._
    val original = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong coffee beside the river bank today " +
      "and the caravan rests under tall cedars until the storm passes"
    val other = "completely different seed content about bounded heaps " +
      "shuffle partitions and adaptive physical plans on large clusters"
    val store = Seq((10L, original), (20L, other)).toDF("doc_id", "text")
    val root = freshRoot("erase")
    IncrementalMinhashStream.build(spark, store, root)
    val probe = Seq((1L, original.replace("coffee", "tea")))
      .toDF("doc_id", "text")
    val pre = verdictSet(
      IncrementalMinhashStream.transformBatch(probe, root))
      .map(t => t._1 -> t).toMap
    assert(pre(1L)._3 >= 1L, s"paraphrase must match pre-erase: $pre")
    val report = IncrementalMinhashStream.removeFromState(spark, root,
      Seq(10L).toDF("doc_id"))
      .collect().map(r => (r.getAs[Int]("band"),
        r.getAs[Long]("n_before"), r.getAs[Long]("n_erased"),
        r.getAs[Long]("n_after"))).toSeq
    // both store docs band everywhere: every band row reports
    // 2 before, 1 erased, 1 after
    assert(report.size == graft.dedup.Dedup.NumBands)
    assert(report.forall { case (_, b, e, a) => b == 2 && e == 1 && a == 1 })
    val post = verdictSet(
      IncrementalMinhashStream.transformBatch(probe, root))
      .map(t => t._1 -> t).toMap
    assert(post(1L)._3 == 0L && post(1L)._2 == 0L,
      s"erased doc must stop matching: $post")
    // erase ≡ rebuild from the surviving store
    val rootR = freshRoot("erase-rebuild")
    IncrementalMinhashStream.build(spark,
      store.filter(col("doc_id") =!= 10L), rootR)
    def dump(r: String) = {
      val (b, s) = IncrementalMinhashStream.sidecars(spark, r)
      (b.collect().map(x => (x.getAs[Int]("band"),
          x.getAs[scala.collection.Seq[Long]]("bucket").toList,
          x.getAs[Long]("sid"))).toSet,
        s.collect().map(x => (x.getAs[Long]("sid"),
          x.getAs[scala.collection.Seq[Long]]("ssig").toList)).toSet)
    }
    assert(dump(root) == dump(rootR), "erase must equal rebuild")
    // duplicated victim ids must not inflate the report (r14 ADVICE):
    // same surgery driven with the victim listed three times
    val rootD = freshRoot("erase-dup")
    IncrementalMinhashStream.build(spark, store, rootD)
    val dupReport = IncrementalMinhashStream.removeFromState(spark, rootD,
      Seq(10L, 10L, 10L).toDF("doc_id"))
      .collect().map(r => (r.getAs[Long]("n_before"),
        r.getAs[Long]("n_erased"), r.getAs[Long]("n_after")))
    assert(dupReport.forall { case (b, e, a) => b == 2 && e == 1 && a == 1 },
      s"dup victims inflated the report: ${dupReport.take(3).toSeq}")
  }

  test("within-batch near-dups (r14 ADVICE): both score store-novel " +
      "but only the lowest id appends, so a later paraphrase is caught") {
    import spark.implicits._
    val original = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong coffee beside the river bank today " +
      "and the caravan rests under tall cedars until the storm passes"
    val root = freshRoot("intra")
    IncrementalMinhashStream.build(spark,
      Seq((9000L, "completely different seed content about bounded " +
        "heaps shuffle partitions and physical plans on large clusters"))
        .toDF("doc_id", "text"), root)
    // batch 1 delivers the original AND its paraphrase together —
    // the blind spot: both are store-novel
    val out = run(root, Seq(
      Seq(StreamDoc(1L, original),
        StreamDoc(2L, original.replace("coffee", "tea"))),
      Seq(StreamDoc(3L, original.replace("coffee", "cocoa")))),
      appendNovel = true).map(t => t._1 -> t).toMap
    assert(out(1L)._3 == 0L && out(2L)._3 == 0L,
      "verdicts stay store-only by contract (both novel vs the store)")
    // but the store appended only doc 1 — doc 3 is flagged against it
    assert(out(3L)._3 >= 1L,
      s"batch-2 paraphrase must be caught by the single survivor: $out")
    val (_, sigs) = IncrementalMinhashStream.sidecars(spark, root)
    val stored = sigs.select(col("sid")).collect().map(_.getLong(0)).toSet
    assert(stored(1L) && !stored(2L),
      s"only the lowest-id near-dup may append: $stored")
  }

  test("erasing the ENTIRE store leaves a working empty store " +
      "(r14 ADVICE): sidecars fall back to empty frames, intake " +
      "scores all-novel, and appends repopulate it") {
    import spark.implicits._
    val store = Seq(
      (10L, "the quick brown fox jumps over the lazy dog while seven " +
        "wizards brew strong coffee beside the river bank today"),
      (20L, "completely different seed content about bounded heaps " +
        "shuffle partitions and adaptive physical plans on clusters"))
      .toDF("doc_id", "text")
    val root = freshRoot("erase-all")
    IncrementalMinhashStream.build(spark, store, root)
    IncrementalMinhashStream.removeFromState(spark, root,
      Seq(10L, 20L).toDF("doc_id"))
    val (b, s) = IncrementalMinhashStream.sidecars(spark, root)
    assert(b.count() == 0 && s.count() == 0, "store must read as empty")
    val verdicts = verdictSet(IncrementalMinhashStream.transformBatch(
      store, root)).map(t => t._1 -> t).toMap
    assert(verdicts(10L)._3 == 0L && verdicts(20L)._3 == 0L,
      "an empty store matches nothing")
    // the empty store accepts appends and dedups against them again
    IncrementalMinhashStream.appendToState(spark, root,
      store.filter(col("doc_id") === 10L))
    val again = verdictSet(IncrementalMinhashStream.transformBatch(
      store.filter(col("doc_id") === 10L), root)).head
    assert(again._3 >= 1L, s"repopulated store must match: $again")
  }
}
