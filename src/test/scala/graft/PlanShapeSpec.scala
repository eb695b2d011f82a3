package graft

import graft.operators.{TextOps, VectorOps}
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape assertions for the LLM-pipeline operators: every dedup /
  * similarity query must get its candidates from an LSH bucket equi-join —
  * a CartesianProduct anywhere in these plans is the 100 TB failure mode
  * this engine exists to avoid. `sim_topk` is the one sanctioned
  * broadcast-nested-loop (tiny query set × corpus).
  */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.sparkPlan.toString

  test("dedup_minhash candidates come from an equi-join, never all-pairs") {
    val p = planOf(TextOps.dedupMinhash(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_ngram has no all-pairs stage") {
    val p = planOf(TextOps.dedupNgram(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_embed pairs only within LSH buckets") {
    val p = planOf(VectorOps.dedupEmbed(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sim_ann joins queries to corpus on the bucket key") {
    val p = planOf(VectorOps.simAnn(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sim_topk is the sanctioned broadcast nested loop over a tiny query set") {
    val p = planOf(VectorOps.simTopk(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_tfidf broadcasts the vocabulary-sized doc-frequency side") {
    val p = planOf(TextOps.textTfidf(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }
}
