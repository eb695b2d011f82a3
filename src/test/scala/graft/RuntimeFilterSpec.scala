package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the sibling of `scan_dpp` for
  * NON-partition join keys: when a shuffle join's build side carries a
  * selective filter, Catalyst can inject a bloom filter built from the
  * filtered side into the probe side's scan, dropping non-joining rows
  * BEFORE the shuffle (`spark.sql.optimizer.runtime.bloomFilter.*`). At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~matching fraction — the engine's plans are
  * join+filter-shaped exactly so Catalyst can do this; the thresholds are
  * deployment-sized (application side ≥ 10 GB by default, hence conf'd
  * down here to demonstrate on test data).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("selective dim filter injects a bloom filter into the fact side of a shuffle join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // default 10GB — the scale the feature is FOR; lowered to fire on testdata
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val filteredDim = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val joined = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
        .join(filteredDim, col("l_orderkey") === col("o_orderkey"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      // prints as might_contain(scalar-subquery [bloom_filter_agg(...)])
      // pushed into the fact side's Filter
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$optimized")

      // and it is a pure pruning optimization — rows are unchanged
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
