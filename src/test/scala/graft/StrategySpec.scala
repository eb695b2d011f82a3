package graft

import graft.operators.TextOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.GraftSqlBridge
import org.scalatest.funsuite.AnyFunSuite

/** Mechanics of `rank_strategies` — the reference's pedagogical three-way
  * comparison [ref: wikipedia/…/WikipediaRanking.scala#rankLangs /
  * #rankLangsUsingIndex / #rankLangsReduceByKey]. The gated query proves the
  * three strategies AGREE (one oracle ranking cross-joined onto three
  * labels); this suite proves they really are three different executions,
  * not one plan labeled three ways:
  *
  *  - the `rescan` strategy must launch at least |lexicon| Spark jobs (one
  *    filtered count per token — the anti-pattern exhibit);
  *  - the `index` strategy's cache must be RELEASED by the time the query
  *    returns (persist → aggregate → unpersist, CacheHygieneSpec's law);
  *  - the `onepass` strategy must remain fully distributed: the returned
  *    frame still contains a live (non-local) aggregation subtree.
  */
class StrategySpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("rescan strategy launches one job per lexicon token; index cache is released") {
    spark.catalog.clearCache()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
    }
    spark.sparkContext.addSparkListener(listener)
    val df =
      try {
        val d = TextOps.rankStrategies(spark, sfDir)
        // construction runs the rescan loop (|lexicon| counts) + the index
        // build/aggregate eagerly; the listener bus delivers asynchronously,
        // so poll the counter up to a deadline instead of racing it
        val deadline = System.currentTimeMillis + 30000
        while (jobs < TextOps.lexicon.size && System.currentTimeMillis < deadline)
          Thread.sleep(50)
        d
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs >= TextOps.lexicon.size,
      s"rescan should launch >= ${TextOps.lexicon.size} jobs, saw $jobs")
    assert(GraftSqlBridge.cacheIsEmpty(spark),
      "index strategy left its inverted-index cache registered")
    // onepass stays distributed: a real aggregate over the documents scan
    // survives into the returned plan (the two local strategies are
    // LocalRelations after their eager evaluation)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate") || df.queryExecution.sparkPlan.toString.contains("HashAggregate"),
      s"onepass lost its distributed aggregation:\n$plan")
    assert(plan.contains("LocalRelation"), s"expected eager strategies as LocalRelations:\n$plan")
  }

  test("the three strategies agree row-for-row with the standalone rank_tokens") {
    val byStrategy = TextOps.rankStrategies(spark, sfDir).collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.map(r => (r.getString(1), r.getLong(2), r.getInt(3))).toSet
      }
    assert(byStrategy.keySet == Set("rescan", "index", "onepass"))
    val one = TextOps.rankTokens(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    byStrategy.foreach { case (name, rows) =>
      assert(rows == one, s"strategy $name diverged from rank_tokens")
    }
  }
}
