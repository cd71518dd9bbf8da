package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the retrieval batch beyond the oracle compare:
  * ranking monotonicity, fixed-order-sum determinism, and salted-join
  * equivalence to the unsalted plan.
  */
class RetrievalSpec extends SparkSpec {

  test("text_tfidf: at most 3 terms per doc, scores non-increasing") {
    val rows = Retrieval.textTfidf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).toSeq == (1 to rs.length))
      val scores = byRank.map(_.getAs[Double]("tfidf"))
      scores.zip(scores.tail).foreach { case (a, b) => assert(a >= b) }
    }
  }

  test("bm25_rank: descending scores, run-deterministic, <= 3 terms") {
    val a = Retrieval.bm25Rank(spark, sfDir).collect()
    val b = Retrieval.bm25Rank(spark, sfDir).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "fixed-order double sum must reproduce bit-identically")
    val scores = a.map(_.getAs[Double]("bm25"))
    scores.zip(scores.tail).foreach { case (x, y) => assert(x >= y) }
    a.foreach(r => assert(r.getAs[Long]("n_terms") <= 3))
  }

  test("vocab_bpe_pairs: two-char pairs, frequencies non-increasing") {
    val rows = Retrieval.vocabBpePairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[String]("pair").length == 2))
    val freqs = rows.map(_.getAs[Long]("pair_freq"))
    freqs.zip(freqs.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("tokenize_ids: OOV path exercised, token counts conserved") {
    val rows = Retrieval.tokenizeIds(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("n_oov") > 0),
      "vocab smaller than corpus vocabulary must produce OOV tokens")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[String]("ids_fp").length == 32)
    }
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = graft.Tables(spark, sfDir, "documents")
      .select(size(split(trim(col("text")), "\\s+")).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(total == expected, "encoding must neither drop nor add tokens")
  }

  test("join_salted_skew: identical to the unsalted broadcast join") {
    val salted = graft.operators.Relational
      .joinSaltedSkew(spark, sfDir).collect()
    val events = graft.Tables(spark, sfDir, "events")
    val dim = events.select(col("event_type")).distinct()
      .withColumn("type_weight", length(col("event_type")).cast("double"))
    val direct = events.join(broadcast(dim), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value") * col("type_weight")), 2)
          .as("weighted_value"))
      .orderBy(col("event_type")).collect()
    assert(salted.map(_.toString).toSeq == direct.map(_.toString).toSeq)
  }
}
