package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.OracleSort._
import org.apache.spark.sql.functions._

/** Join family (SURVEY §2.C).
  *
  * The reference's single join is a pair-RDD shuffle join of questions to
  * answers [ref: stackoverflow/…/StackOverflow.scala#groupedPostings]. Here
  * every join is declared and Catalyst picks the physical strategy; we force
  * `broadcast()` only for the dimensions that are small BY SCHEMA DESIGN
  * (region=5 rows, nation=25 — fixed size at any scale factor, so the hint
  * is still correct at 100 TB). Fact-to-fact joins (orders⋈lineitem) are
  * left to sort-merge/shuffled-hash + AQE, which is the right call when both
  * sides are TB-scale.
  */
object Joins {

  /** C1: inner equi-join orders⋈lineitem, aggregated per order status. */
  def joinInner(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"), "inner")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_lines"),
        graft.functions.Num.money(
          sum(graft.functions.Num.discounted(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .oracleSorted("o_orderstatus")

  /** C2: multi-way star join with broadcast dimensions — revenue by region. */
  def joinStar(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(graft.functions.Num.money(sum(graft.functions.Num.dec2(col("o_totalprice")))).as("revenue"),
           count(lit(1)).as("n_orders"))
      .oracleSorted("r_name")

  /** C4: anti join — customers with no orders (NOT EXISTS). */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .oracleSorted("c_custkey")

  /** C4b: semi join — customers with at least one order (EXISTS). */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .oracleSorted("c_custkey")

  /** Left outer join preserving customers with zero orders (count of a
    * nullable column counts only matches).
    */
  def joinOuter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
           coalesce(graft.functions.Num.money(
             sum(graft.functions.Num.dec2(col("o_totalprice")))), lit(0.0)).as("sum_total"))
      .oracleSorted("c_custkey")
}
