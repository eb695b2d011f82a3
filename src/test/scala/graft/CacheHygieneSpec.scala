package graft

import org.apache.spark.sql.GraftSqlBridge
import org.scalatest.funsuite.AnyFunSuite

/** Cache-hygiene law (round-2 VERDICT #5): no InMemoryRelation may survive a
  * completed query invocation. The operators that materialize intermediates
  * (dedup family, IVF, k-means) now use lineage-cut `localCheckpoint` blocks
  * (freed by the ContextCleaner when the result frame is garbage) or a
  * `try/finally unpersist` — a long-lived session running the inventory in a
  * loop (Bench: 4 passes × 75 queries) must not accumulate storage memory.
  */
class CacheHygieneSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private val formerlyCaching =
    Seq("dedup_minhash", "dedup_ngram", "dedup_cluster", "dedup_pipeline",
      "sim_ivf", "kmeans_clusters", "decontaminate", "join_asof_salted")

  formerlyCaching.foreach { name =>
    test(s"$name leaves the CacheManager empty after full materialization") {
      spark.catalog.clearCache() // isolate from any other suite's leftovers
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      assert(GraftSqlBridge.cacheIsEmpty(spark),
        s"$name left an InMemoryRelation registered after its action completed")
    }
  }
}
