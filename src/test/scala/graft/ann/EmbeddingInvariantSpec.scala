package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the testdata contract documented on [[graft.Tables]]: no
  * embedding vector in the shipped testdata has zero L2 norm. The
  * Spark kernels guard zero-norm cosines to 0.0 while the DuckDB
  * oracles' `list_cosine_similarity` would produce NaN — the gate's
  * Spark ≡ oracle equivalence rests on this invariant, so a testdata
  * regeneration that violates it must fail here, not in the gate.
  */
class EmbeddingInvariantSpec extends SparkSpec {
  test("no zero-norm embedding in the sf0.001 snapshot") {
    val bad = Tables(spark, sfDir, "embeddings")
      .select(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x).as("sq"))
      .filter(col("sq") === 0.0d)
      .count()
    assert(bad === 0L)
  }

  test("embeddings are non-empty arrays of finite floats") {
    val bad = Tables(spark, sfDir, "embeddings")
      .filter(size(col("embedding")) === 0 ||
        exists(col("embedding"), x => isnan(x) || x === Float.PositiveInfinity
          || x === Float.NegativeInfinity))
      .count()
    assert(bad === 0L)
  }
}
