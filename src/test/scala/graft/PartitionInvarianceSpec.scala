package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory parallelism-invariance law: every registered query must
  * produce IDENTICAL rows under a different `spark.sql.shuffle.partitions`
  * — the mechanical form of the cluster-portability claim ("the result
  * does not depend on how many tasks computed it"). This is the law the
  * exact-decimal discipline (`Num`, `sim_ivf` centroid sums,
  * `text_logprob`) exists to uphold: a raw cross-partition float sum
  * passes a single-config gate and silently drifts when the merge order
  * changes with the partition count. The alternate session shares the
  * SparkContext but has its own SQLConf (`newSession`), so the two runs
  * genuinely plan different exchange widths.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val alt = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "3") // ≠ 4, and not a divisor
    s
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: identical rows at shuffle.partitions = 4 and 3") {
      val base = fn(spark, sfDir).collect().map(_.toString).toSeq
      val other = fn(alt, sfDir).collect().map(_.toString).toSeq
      assert(base == other, {
        val diff = base.zip(other).zipWithIndex.collectFirst {
          case ((x, y), i) if x != y => s"first diff at row $i:\n  4p: $x\n  3p: $y"
        }.getOrElse(s"sizes ${base.size} vs ${other.size}")
        s"$name depends on the partition count — $diff"
      })
    }
  }
}
