package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SemanticDedupStreamSpec extends SparkSpec {

  /** The sf0.001 embeddings as an ordered intake log. */
  private lazy val corpus: Array[StreamVec] = {
    import spark.implicits._
    graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect().sortBy(_._1).map { case (i, e) => StreamVec(i, e) }
  }

  private def run(batches: Seq[Seq[StreamVec]], name: String)
      : Set[(Long, Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamVec]
    val q = SemanticDedupStream.pipeline(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bucket"),
          r.getAs[Long]("dup_of"), r.getAs[Double]("max_cos"))).toSet
    } finally q.stop()
  }

  test("vec_id-ordered replay of the sf corpus emits exactly the " +
      "registered stream_semantic_dedup batch dup rows, and the " +
      "micro-batch split does not change the witnesses") {
    val batch = Streaming.streamSemanticDedup(spark, sfDir)
      .filter(col("is_dup") === 1).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("dup_of"), r.getAs[Double]("max_cos"))).toSet
    assert(batch.nonEmpty, "sf corpus must contain semantic dups")
    val oneBatch = run(Seq(corpus.toSeq), "semdup_one")
    assert(oneBatch == batch, "single-batch stream must equal batch arm")
    val threeBatches =
      run(corpus.grouped(170).map(_.toSeq).toSeq, "semdup_three")
    assert(threeBatches == batch, "batching must not change witnesses")
  }

  test("rep-cap bounds state: a vector arriving at a full bucket is " +
      "still gated but never becomes a representative") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two ORTHOGONAL one-hot vectors a, b that land in the same
    // bucket (same sign under all hyperplanes — ~4 of 64 dims share
    // each of the 16 sign patterns, so a pair always exists)
    def oneHot(i: Int): Array[Float] = {
      val e = new Array[Float](64); e(i) = 1.0f; e
    }
    val byBucket = (0 until 64).groupBy(i =>
      SemanticDedupStream.bucketOf(oneHot(i)))
    val pair = byBucket.values.find(_.size >= 2).get
    val a = oneHot(pair(0)); val b = oneHot(pair(1))
    // fill the bucket's cap with clones of a; then past the cap:
    // b twice (cos(a,b)=0 — clean both times; if the first b had
    // leaked into state, the second would witness it at cos 1.0),
    // and one more a-clone (gating must still work past the cap)
    val fill = (0 until SemanticDedupStream.RepCap)
      .map(i => StreamVec(1000L + i, a))
    val b1 = StreamVec(100000L, b)
    val b2 = StreamVec(100001L, b)
    val a2 = StreamVec(100002L, a)
    val mem = MemoryStream[StreamVec]
    val q = SemanticDedupStream.pipeline(mem.toDS())
      .writeStream.format("memory").queryName("semdup_cap")
      .outputMode("append").start()
    val rows =
      try {
        mem.addData((fill :+ b1 :+ b2 :+ a2): _*)
        q.processAllAvailable()
        spark.sql("SELECT * FROM semdup_cap").collect()
          .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("dup_of"))
          .toMap
      } finally q.stop()
    assert(!rows.contains(b1.vec_id), "orthogonal vector is clean")
    assert(!rows.contains(b2.vec_id),
      "second b must NOT witness the first — b1 arrived past the cap " +
        "and must not have entered state")
    assert(rows.get(a2.vec_id).contains(1000L),
      "gating still works past the cap, against the earliest rep")
  }

  test("bucketOf is the E2 signature at tables=1 (batch arm's " +
      "rhp_sigs column and the stream's state key agree)") {
    import spark.implicits._
    val fromPlan = Streaming.streamSemanticDedup(spark, sfDir)
      .select(col("vec_id"), col("bucket"))
      .as[(Long, Long)].collect().toMap
    corpus.take(50).foreach { v =>
      assert(fromPlan(v.vec_id) ==
        SemanticDedupStream.bucketOf(v.embedding))
    }
  }
}
