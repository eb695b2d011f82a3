package graft

import graft.operators.{Joins, Windows}
import org.scalatest.funsuite.AnyFunSuite

/** Join/window plan-shape specs: the physical strategies the Scaladoc
  * promises must actually appear in the executed plan.
  */
class JoinsWindowsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("join_star broadcasts the fixed-size dimension tables") {
    val plan = Joins.joinStar(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("topk plans as TakeOrderedAndProject (per-partition heaps, no global sort)") {
    val plan = Windows.topk(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("anti and semi joins partition customers exactly") {
    val anti = Joins.joinAnti(spark, sfDir).count()
    val semi = Joins.joinSemi(spark, sfDir).count()
    val all = Tables.customer(spark, sfDir).count()
    assert(anti + semi == all)
  }

  test("window_top1 picks the highest value per user with id tiebreak") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = Seq((1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 9.0), (2L, 20L, 1.0))
      .toDF("user_id", "event_id", "value")
    val got = ev.withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))))
      .filter(col("rn") === 1).select("user_id", "event_id")
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 11L), (2L, 20L))) // tie at 9.0 → lower event_id
  }

  test("join_asof matches the brute-force range-join + top-1 definition") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // Naive oracle: range join events×orders on user, keep the latest
    // order_date ≤ ts (orderkey max at equal date). Quadratic per key —
    // fine at sf0.001, exactly what the scalable union+window must equal.
    val ord = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp").as("t"))
      .agg(max("o_orderkey").as("k"))
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val naive = ev.join(ord, col("user_id") === col("o_custkey") && col("t") <= col("ts"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_id").orderBy(desc("t"))))
      .filter(col("rn") === 1 || col("t").isNull)
      .select(col("event_id"), col("t").as("last_order_date"), col("k").as("last_orderkey"))
    val got = Joins.joinAsof(spark, sfDir)
      .select("event_id", "last_order_date", "last_orderkey")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("join_salted equals the unsalted join and contains no cartesian product") {
    import org.apache.spark.sql.functions._
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Num.money(
          sum(graft.functions.Num.dec2(col("l_extendedprice")))).as("gross"))
    val salted = Joins.joinSalted(spark, sfDir)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("join_range equals the naive theta join and plans as an equi-join") {
    import org.apache.spark.sql.functions._
    // Naive oracle: pure non-equi self-join (what the bin trick must equal).
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val r = ev.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id"))
    val naive = ev.join(r,
        col("user_id") === col("r_user") && col("r_ts") > col("ts") &&
        col("r_ts") <= col("ts") + expr("INTERVAL 1 MINUTE"), "left")
      .groupBy("event_id").agg(count(col("r_id")).as("n_next_min"))
    val got = Joins.joinRange(spark, sfDir).select("event_id", "n_next_min")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    val plan = got.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("window_running accumulates in order date order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val o = Seq((1L, 101L, "2024-01-01", 10.0), (1L, 102L, "2024-01-02", 20.0), (1L, 103L, "2024-01-03", 5.0))
      .toDF("o_custkey", "o_orderkey", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("date"))
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val run = o.select(col("o_orderkey"),
        sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("rt"))
      .orderBy("o_orderkey").collect().map(_.getDouble(1)).toSeq
    assert(run == Seq(10.0, 30.0, 35.0))
  }
}
