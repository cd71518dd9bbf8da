package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.etl.CorpusPipeline

/** G6 `CorpusStream` — the 24/7 intake front of the corpus pipeline
  * (A16) as a Structured Streaming flow: watermark-bounded exact dedup
  * on the document key, then the same clean + quality-gate stages the
  * batch pipeline runs (they are pure projections/filters, so one code
  * path serves both modes — the Spark contract for incremental
  * pipelines).
  *
  * Near-dup clustering and the split stay BATCH post-passes by design:
  * transitive cross-document state (connected components over pair
  * edges) has no bounded-state streaming formulation — the standard
  * architecture is a streaming intake feeding periodic batch
  * compaction, which is exactly A16 over the intake's output.
  */
object CorpusStream {

  val DedupHorizon = "1 hour"

  /** Streaming transform over a (doc_id, ts, text) stream. The C27
    * model-based quality score rides along as a column — the same
    * [[graft.text.CorpusQuality.classifierScoreInt]] projection the
    * batch query uses, applied here to the intake's CLEANED token
    * stream (post control-char scrub), which is the right input at
    * this stage: scoring happens after cleanup, exactly as the batch
    * corpus_pipeline orders its stages. (The standalone batch
    * quality_classifier query scores raw-text tokens, so a doc whose
    * tokenization changes under cleaning can score differently there
    * — same model, different stage input.) Downstream consumers gate
    * on `qc_keep` without a second scoring pass.
    */
  def intake(docs: DataFrame): DataFrame =
    CorpusPipeline.qualityGate(CorpusPipeline.cleaned(
      docs
        .withWatermark("ts", DedupHorizon)
        .dropDuplicatesWithinWatermark("doc_id")))
      .withColumn("qc_score_int",
        graft.text.CorpusQuality.classifierScoreInt)
      .withColumn("qc_keep",
        (org.apache.spark.sql.functions.col("qc_score_int") >= 0)
          .cast("int"))
      .select("doc_id", "ts", "clean", "n_tokens", "qc_score_int",
        "qc_keep")
}
