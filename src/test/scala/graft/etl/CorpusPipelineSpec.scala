package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {

  test("corpus_pipeline: splits partition the survivors, counts consistent") {
    val out = CorpusPipeline.corpusPipeline(spark, sfDir).collect()
    assert(out.nonEmpty)
    val splits = out.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // every split row is internally consistent
    out.foreach { r =>
      assert(r.getLong(1) > 0)                    // n_docs
      assert(r.getLong(2) >= r.getLong(1) * CorpusPipeline.MinTokens) // sum_tokens
    }
    // train is the majority split by construction (75% of hash space)
    val byName = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.getOrElse("train", 0L) >=
      byName.getOrElse("val", 0L).max(byName.getOrElse("test", 0L)))
  }

  test("pack_sequences: budget respected except single-doc sequences") {
    val seqs = graft.text.TextOps.packSequences(spark, sfDir).collect()
    assert(seqs.nonEmpty)
    seqs.foreach { r =>
      val nDocs = r.getLong(2)
      val tokens = r.getLong(3)
      assert(nDocs > 0)
      // a multi-doc sequence can never exceed the budget; only an
      // oversize single document may
      if (nDocs > 1) {
        assert(tokens <= graft.text.TextOps.PackBudget,
          s"sequence ${r.getLong(0)}/${r.getLong(1)} has $tokens tokens")
      }
    }
    // packing conserves the corpus: total packed tokens = total doc tokens
    val packed = seqs.map(_.getLong(3)).sum
    val total = graft.Tables(spark, sfDir, "documents")
      .select(sum(size(split(trim(col("text")), "\\s+"))))
      .head().getLong(0)
    assert(packed == total)
  }
}
