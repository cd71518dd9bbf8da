package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusBudgetSpec extends SparkSpec {

  private lazy val rows = CorpusQuality.corpusBudget(spark, sfDir).collect()

  test("corpus_budget: every source's selection stays within its budget") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val budget = r.getAs[Long]("budget_tokens")
      val selected = r.getAs[Long]("selected_tokens")
      assert(selected <= budget,
        s"${r.getAs[String]("source")}: $selected > budget $budget")
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"))
      val fill = r.getAs[Double]("fill")
      assert(fill > 0.0 && fill <= 1.0)
    }
  }

  test("corpus_budget: greedy is maximal — the next doc in draw order would overflow") {
    // recompute the per-source (draw, doc_id)-ordered doc list and
    // check the FIRST unselected doc would cross the budget
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 4), 16, 10).cast("long").as("draw"))
      .collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("draw"), r.getAs[Long]("doc_id"), r.getAs[Long]("n"))))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sortBy(t => (t._1, t._2)) }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val budget = r.getAs[Long]("budget_tokens")
      val k = r.getAs[Long]("n_selected").toInt
      val ordered = docs(src)
      // prefix property: selected docs ARE the first k in draw order
      val prefixTokens = ordered.take(k).map(_._3).sum
      assert(prefixTokens == r.getAs[Long]("selected_tokens"),
        s"$src: selection is not the draw-order prefix")
      if (k < ordered.size)
        assert(prefixTokens + ordered(k)._3 > budget,
          s"$src: doc ${ordered(k)._2} still fits but was not selected")
    }
  }

  test("corpus_budget: selection identity is deterministic across runs") {
    val again = CorpusQuality.corpusBudget(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("sel_fp")).toSeq ==
      again.map(_.getAs[String]("sel_fp")).toSeq)
  }
}
