package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting — the engine's docs lean on "AQE handles skew"
  * for every shuffle-join shape that does NOT hand-salt (the salted forms
  * exist for windows and for deliberate demos); this spec makes that claim
  * mechanical: a planted hot key must make AQE split the skewed partition
  * (final plan shows `skew=true`) and the split join must return exactly
  * the unskewed join's rows. Thresholds are deployment-sized by default
  * (256 MB partitions) — conf'd down here to fire on test data, the same
  * pattern RuntimeFilterSpec uses for the bloom join.
  */
class AqeSkewSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("planted hot key: AQE splits the skewed partition and preserves the join result") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // deployment defaults are 256MB/factor-5 — lowered to fire on test data
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      // keep the join a shuffle join — a broadcast has no partitions to skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fact: one key owns 90% of rows (real skew — partition-level, not
      // just key-level); dim: every key once
      val fact = spark.range(0, 100000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = fact.join(dim, "k")
      // materialize THIS dataframe's own plan (count() would plan a separate
      // aggregate query and leave `joined`'s adaptive plan untouched)
      val n = joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")
      // correctness under the split: row-for-row the unskewed join
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      assert(n == fact.join(dim, "k").count(), "skew split changed the result")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
