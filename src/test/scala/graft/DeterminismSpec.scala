package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory determinism law: every registered query collected twice
  * in the same session must produce IDENTICAL rows. Determinism is the
  * oracle contract (the driver hash-compares exact values), and
  * non-determinism is precisely the bug class that is invisible to a
  * single-run gate: round 3's `quantile_bins` emitted different deciles
  * per EXECUTION because `repartitionByRange` re-sampled partition
  * boundaries per job — caught then only because sf0.1 happened to
  * diverge. This sweep makes that class mechanical for every query,
  * including ones with driver-coordinated loops (k-means, label
  * propagation), lineage-cut checkpoints, and staged fixture mirrors —
  * adding a query to the registry automatically adds it to the law.
  */
class DeterminismSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: two executions produce identical rows") {
      def snap(): Seq[String] =
        fn(spark, sfDir).collect().map(_.toString).toSeq
      val (a, b) = (snap(), snap())
      assert(a == b, {
        val diff = a.zip(b).zipWithIndex.collectFirst {
          case ((x, y), i) if x != y => s"first diff at row $i:\n  $x\n  $y"
        }.getOrElse(s"sizes ${a.size} vs ${b.size}")
        s"$name is not run-to-run deterministic — $diff"
      })
    }
  }
}
