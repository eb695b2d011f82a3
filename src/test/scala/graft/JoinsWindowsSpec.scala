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
