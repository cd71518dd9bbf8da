package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions.minhashSig
import graft.text.TextOps

/** D19 `dedup_incremental_minhash` — the near-dup tier of the
  * intake-vs-store dedup. The load-bearing claim: a PARAPHRASED copy
  * of a store doc is caught at intake while the store itself is
  * never rescanned (the kernel sees only the two persisted sidecars,
  * never the store text).
  */
class DedupIncrementalMinhashSpec extends SparkSpec {

  private def sigOf(docs: DataFrame): DataFrame = docs
    .withColumn("toks", TextOps.tokens(col("text")))
    .withColumn("shingles", TextOps.wordShingles(col("toks")))
    .filter(size(col("shingles")) >= 1)
    .select(col("doc_id"), minhashSig(col("shingles"), Dedup.NumPerms).as("sig"))

  test("planted near-dup of a store doc is caught at intake; the " +
      "kernel reads ONLY the sidecars (store never rescanned)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong coffee beside the river bank today"
    val storeDocs = Seq(
      (1L, base),
      (2L, "completely unrelated text about spark physical plans and " +
        "bounded heaps running on large clusters every single day")
    ).toDF("doc_id", "text")
    val intakeDocs = Seq(
      (10L, base.replace("coffee", "tea")),       // paraphrased near-dup
      (15L, base),                                // exact copy
      (20L, "nothing here resembles any stored document in any way " +
        "whatsoever because every token is different from them all")
    ).toDF("doc_id", "text")
    // sidecars built ONCE from the store, then checkpointed: the
    // intake arm receives only these two frames — there is no code
    // path back to storeDocs
    val (bandSc, sigSc) = Dedup.minhashSidecars(sigOf(storeDocs))
    val out = Dedup.intakeMinhashDedup(
        sigOf(intakeDocs), bandSc.localCheckpoint(), sigSc.localCheckpoint())
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // exact copy: every permutation agrees
    assert(out(15L).getAs[Long]("best_match_perms") == Dedup.NumPerms.toLong)
    assert(out(15L).getAs[Long]("n_near_dups") >= 1L)
    assert(out(15L).getAs[Long]("best_match_bp") == 10000L)
    // paraphrase: one swapped token kills only the shingles crossing
    // it — true Jaccard ≈ 0.74, so the 128-perm estimate must clear
    // the NumPerms/2 bar
    assert(out(10L).getAs[Long]("n_near_dups") >= 1L,
      s"paraphrased near-dup missed: ${out(10L)}")
    assert(out(10L).getAs[Long]("best_match_perms") >=
      Dedup.IncMinhashMinMatches.toLong)
    // unrelated doc: may or may not band-collide, but must never
    // clear the near-dup bar
    assert(out(20L).getAs[Long]("n_near_dups") == 0L)
  }

  test("registered query: one row per non-empty intake doc, integers " +
      "only, exact copies score 128/128") {
    val out = Dedup.queries("dedup_incremental_minhash")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("doc_id") % Dedup.IncMod == 0))
    assert(rows.forall { r =>
      val bp = r.getAs[Long]("best_match_bp")
      bp >= 0L && bp <= 10000L &&
        r.getAs[Long]("n_near_dups") <= r.getAs[Long]("n_candidates")
    })
  }
}
