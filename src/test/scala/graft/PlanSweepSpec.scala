package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{InputAdapter, LocalTableScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanHelper, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory plan audit: EVERY query registered in `SparkEntry.queries`
  * is planned and its physical plan swept for the two 100 TB scale-killers —
  * `CartesianProduct` (all-pairs shuffle join) and `BroadcastNestedLoopJoin`
  * (per-row scan of a broadcast side). Targeted shape assertions live in
  * PlanShapeSpec; this sweep guarantees no FUTURE operator regresses into an
  * all-pairs plan unnoticed — adding a query to the registry automatically
  * adds it to the audit.
  *
  * `sim_topk` is the one sanctioned shuffle-join BNLJ: the exact-recall
  * baseline deliberately scans the corpus against a broadcast query set
  * bounded at QueryVecs (=8) rows, so the "loop" side is a constant — that
  * is the documented scale story. `rag_retrieve` (round 10) gets the same
  * grant for the same reason: its brute-force scoring stage is a broadcast
  * cross join against a query set bounded by construction (every
  * RagQueryMod-th document), fan-out only on the broadcast side — the
  * allowlist below is the single place these are granted. `rag_hybrid`
  * embeds `ragDenseRanked` (the same single-sourced body as
  * `rag_retrieve`) as its dense arm, so it inherits the grant — but ONLY
  * for that one node: its allowance is counted (at most one BNLJ), so an
  * unintended nested loop sneaking into the sparse arm or the fusion join
  * still fails the sweep (round-10 ADVICE #3).
  */
class PlanSweepSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession.{spark, sfDir}

  // name -> max sanctioned BroadcastNestedLoopJoin count in the plan
  private val bnljAllowed = Map("sim_topk" -> 1, "sim_mips" -> 1,
    "sim_mrl" -> 1, "sim_hamming" -> 1, "sim_mmr" -> 1,
    "rag_retrieve" -> 1, "rag_hybrid" -> 1,
    // the k-row (=10) centroid table broadcast onto the arriving batch —
    // bounded by the list count, never corpus-sized
    "sim_ivf_incremental" -> 1)

  /** Unwrap the execution-detail nodes that can sit between an exchange and
    * its semantic child (round-3 ADVICE #3: the previous adjacent-plan-LINE
    * check could mis-classify through WholeStageCodegen / AQE wrappers).
    */
  @annotation.tailrec
  private def semanticChild(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => semanticChild(w.child)
    case i: InputAdapter          => semanticChild(i.child)
    case q: QueryStageExec        => semanticChild(q.plan)
    case r: ReusedExchangeExec    => semanticChild(r.child)
    case other                    => other
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without CartesianProduct" +
         (if (bnljAllowed.contains(name)) " and within its BNLJ allowance"
          else " or BroadcastNestedLoopJoin")) {
      // count NODES structurally (round-11 ADVICE #3): regex-counting the
      // plan STRING double-counts when Spark prints Initial+Final AQE
      // sections or a reused subtree — collect() walks each physical node
      // once, through AQE wrappers
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      val cartesian = collect(plan) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      assert(cartesian.isEmpty, s"$name plan contains CartesianProduct:\n$plan")
      val bnljCount = collect(plan) {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }.size
      assert(bnljCount <= bnljAllowed.getOrElse(name, 0),
        s"$name plan contains $bnljCount BroadcastNestedLoopJoin(s), " +
          s"allowance ${bnljAllowed.getOrElse(name, 0)}:\n$plan")
    }

    // Third scale-killer class: a single-partition exchange carrying RAW
    // ROWS — the global-window / global-sort-into-one-task trap. A
    // SinglePartition exchange is legitimate exactly when its child is an
    // aggregate (it then moves one partial-state row per task, bounded by
    // parallelism, not data) or a LocalTableScan (driver-built constant
    // frame). Anything else under it concentrates the corpus on one task.
    test(s"$name single-partition exchanges carry only aggregate states") {
      // walk the SparkPlan tree (AQE-aware via AdaptiveSparkPlanHelper's
      // collect) instead of matching adjacent plan-string lines
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      val offenders = collect(plan) {
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
          e -> semanticChild(e.child)
      }.filterNot { case (_, c) =>
        c.isInstanceOf[BaseAggregateExec] || c.isInstanceOf[LocalTableScanExec]
      }
      assert(offenders.isEmpty,
        s"$name: SinglePartition exchange over raw rows:\n" +
          offenders.map { case (e, c) => s"child ${c.nodeName} of:\n$e" }.mkString("\n"))
    }
  }
}
