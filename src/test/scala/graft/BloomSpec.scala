package graft

import graft.operators.Joins
import graft.plans.BloomProbe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the explicit bloom semi-reduction (`join_bloom` +
  * plans/BloomProbe.scala):
  *
  *  1. no false negatives — every key inserted into the sketch probes true
  *     (the property that makes the downstream equi-join EXACT);
  *  2. the probe is genuinely selective on non-members (sanity on fpp);
  *  3. the probe filter sits directly on the fact scan, BELOW the join —
  *     the 100 TB point of the operator (shuffle ∝ matching rows);
  *  4. the probe runs inside WholeStageCodegen (no interpreted fallback);
  *  5. end-to-end parity with the un-bloomed plain join.
  */
class BloomSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("no false negatives; non-member pass rate is near fpp") {
    val dim = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val sketch = dim.stat.bloomFilter("o_orderkey", math.max(dim.count(), 1L), 0.01)
    // 1. every member probes true — via the Expression path, not the sketch API
    val misses = dim.where(!BloomProbe.probe(col("o_orderkey"), sketch)).count()
    assert(misses == 0L, s"bloom probe dropped $misses member keys (false negatives)")
    // 2. disjoint probe keys (shifted far out of the key domain) mostly miss
    val probeRange = spark.range(10_000_000L, 10_010_000L).toDF("k")
    val fp = probeRange.where(BloomProbe.probe(col("k"), sketch)).count()
    assert(fp < 1000L, s"false-positive rate implausibly high: $fp / 10000")
  }

  test("join_bloom: probe filter sits on the fact scan below the join") {
    val qe = Joins.joinBloom(spark, sfDir).queryExecution
    val opt = qe.optimizedPlan.toString.linesIterator.toVector
    val probeIdx = opt.indexWhere(_.contains("bloom_probe"))
    // the fact relation is the one carrying l_extendedprice (file-source
    // relations print their schema, not their path)
    val scanIdx = opt.indexWhere(l => l.contains("Relation") && l.contains("l_extendedprice"))
    assert(probeIdx >= 0, opt.mkString("\n"))
    assert(scanIdx > probeIdx, "probe filter must sit above the lineitem relation")
    assert(!opt.slice(probeIdx, scanIdx).exists(_.contains("Join")),
      "no join may intervene between the probe filter and the fact scan:\n" +
        opt.mkString("\n"))
  }

  test("the probe filter runs inside WholeStageCodegen") {
    // assert on an exchange-free scan+filter (AQE's pre-execution print of
    // the full join hides per-operator codegen stars)
    val dim = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val sketch = dim.stat.bloomFilter("o_orderkey", math.max(dim.count(), 1L), 0.01)
    val plan = Tables.lineitem(spark, sfDir)
      .select("l_orderkey")
      .where(BloomProbe.probe(col("l_orderkey"), sketch))
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_probe"), plan)
    assert(plan.contains("*(1) Filter"),
      s"bloom_probe filter fell out of WholeStageCodegen:\n$plan")
  }

  test("join_bloom equals the plain un-bloomed join row-for-row") {
    val bloomed = Joins.joinBloom(spark, sfDir).collect().toSeq
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(month(col("o_orderdate")).cast("int").as("o_month"))
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Num.money(
          sum(graft.functions.Num.discounted(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .orderBy("o_month")
      .collect().toSeq
    assert(bloomed == plain)
    assert(bloomed.nonEmpty, "fixture must exercise at least one group")
  }
}
