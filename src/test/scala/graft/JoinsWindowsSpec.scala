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

  test("anti and semi joins partition customers exactly, and anti is non-empty") {
    import org.apache.spark.sql.functions._
    // joinAnti's build side is orders∩1995, so the partition law pairs it
    // with a semi-join over the SAME slice (not joinSemi's full orders)
    val anti = Joins.joinAnti(spark, sfDir).count()
    val orders1995 = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-01-01").cast("timestamp"))
    val semi1995 = Tables.customer(spark, sfDir)
      .join(orders1995, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val all = Tables.customer(spark, sfDir).count()
    assert(anti + semi1995 == all)
    // the round-6 vacuity fix: the gate row must be able to fail
    assert(anti > 0, "join_anti complement is empty — the gate row is vacuous again")
    // and joinSemi over full orders still covers every customer here
    assert(Joins.joinSemi(spark, sfDir).count() == all)
  }

  test("setop_except at day grain is non-empty (non-vacuous gate)") {
    assert(graft.operators.Aggregates.setopExcept(spark, sfDir).count() > 0)
  }

  test("join_asof_salted: parity with join_asof under a planted hot key + bin-spread law") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/tmp/graft_test_asof_skew"
    val dayNs = 86400L * 1000000000L
    val baseNs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000000L
    // hot user 1: 2000 events spread over 10 days; 10 cold users: 20 each.
    // ts written as int64 nanos (the driver testdata's events encoding).
    val hot = (0 until 2000).map(i => (i.toLong, 1L, baseNs + i * (10 * dayNs / 2000)))
    val cold = (0 until 200).map(i => (10000L + i, 2L + i % 10, baseNs + i * (10 * dayNs / 200)))
    (hot ++ cold).toDF("event_id", "user_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // 5 orders per user on alternating days straddling the event range:
    // pre-range orders exercise the carry path, in-range the within-bin path
    val orders = for { u <- 1L to 11L; k <- 0 until 5 }
      yield (u * 100 + k, u,
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(k * 2 - 4)))
    orders.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val salted = Joins.joinAsofSalted(spark, dir).collect().toSeq
    val plain = Joins.joinAsof(spark, dir).collect().toSeq
    assert(salted == plain, "salted as-of result diverges from the per-key window form")

    // the law: join_asof's per-key window puts all 2000 hot rows on ONE
    // task; the salted window partitions by (key, day-bin), so no task
    // sees more than one key-day (~1/10 of the hot key here)
    val maxBin = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div ${Joins.AsofBinMicros}").as("bin"))
      .groupBy("user_id", "bin").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBin <= 2000 / 8, s"hot key not spread: max (key,bin) load $maxBin")
  }

  test("join_asof_salted plans its data-sized window over (key, bin), never key alone") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = Joins.joinAsofSalted(spark, sfDir).queryExecution.optimizedPlan
    val specs = plan.collect { case w: LWindow => w.partitionSpec.length }
    // exactly two windows: the (key, bin) pass over data rows and the
    // per-key carry pass over bin-summary rows — a refactor that drops the
    // bin from the data window reintroduces the hot-key bottleneck
    assert(specs.count(_ == 2) == 1 && specs.count(_ == 1) == 1,
      s"window partition-spec sizes: $specs")
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

  test("window_range: RANGE frame includes value-peers and is tie-deterministic (E5)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // custkey 1: totals 100, 100 (tie), 550, 1100 — frame is [v-500, v]
    val o = Seq((1L, 1L, 100.0), (1L, 2L, 100.0), (1L, 3L, 550.0), (1L, 4L, 1100.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
      .rangeBetween(-500, Window.currentRow)
    val got = o.select(col("o_orderkey"), count(lit(1)).over(w).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ties are peers: BOTH 100-rows see each other regardless of row order;
    // 550 sees the two 100s (100 >= 50); 1100 sees only itself (600 < 1100-500)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L), got.toString)
  }

  test("window_ntile: quartiles balance and pct_rank/cume_dist are exact integer ratios (E4)") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Windows.windowNtile(spark, sfDir).collect()
    rows.groupBy(_.getAs[Number]("s_nationkey").longValue).foreach { case (_, part) =>
      val n = part.length
      // ntile(4) bucket sizes differ by at most 1
      val sizes = part.groupBy(_.getInt(part.head.fieldIndex("quartile"))).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"unbalanced quartiles: $sizes")
      // with a total-order window, pct_rank == (rowpos-1)/(n-1), cdist == rowpos/n
      val sorted = part.sortBy(r => (-r.getDouble(r.fieldIndex("s_acctbal")),
                                     r.getAs[Number]("s_suppkey").longValue))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val expPr = if (n == 1) 0.0 else i.toDouble / (n - 1)
        assert(r.getDouble(r.fieldIndex("pct_rank")) == expPr)
        assert(r.getDouble(r.fieldIndex("cdist")) == (i + 1).toDouble / n)
      }
    }
  }

  test("window_moving: frame is bounded at 4 and a customer's first row averages itself (E7)") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Windows.windowMoving(SparkTestSession.spark, SparkTestSession.sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(4) >= 1 && r.getLong(4) <= 4), "frame escaped its bounds")
    // rows arrive in (custkey, orderdate, orderkey) order: each customer's
    // first row has n_window=1 and trailing_avg == its own total (in cents)
    val firstPerCust = rows.groupBy(_.getLong(0)).map(_._2.head)
    firstPerCust.foreach { r =>
      assert(r.getLong(4) == 1L, s"first row of customer ${r.getLong(0)} has window ${r.getLong(4)}")
    }
    val totals = graft.Tables.orders(SparkTestSession.spark, SparkTestSession.sfDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    firstPerCust.foreach { r =>
      val want = math.round(totals(r.getLong(1)) * 100).toDouble / 100
      assert(math.abs(r.getDouble(3) - want) < 1e-9,
        s"order ${r.getLong(1)}: trailing_avg ${r.getDouble(3)} != own total $want")
    }
  }

  test("window_ewma: first row is its own value, ewma stays in the frame hull, recency dominates (E10)") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Windows.windowEwma(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val iK = rows.head.fieldIndex("o_orderkey")
    val iE = rows.head.fieldIndex("ewma")
    // rows arrive in (custkey, orderdate, orderkey) order: each customer's
    // first row has a 1-element frame, so ewma == its own total
    val totals = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCust = rows.groupBy(_.getLong(rows.head.fieldIndex("o_custkey")))
    byCust.values.map(_.head).foreach { r =>
      val want = math.round(totals(r.getLong(iK)) * 100).toDouble / 100
      assert(math.abs(r.getDouble(iE) - want) < 1e-9,
        s"order ${r.getLong(iK)}: ewma ${r.getDouble(iE)} != own total $want")
    }
    // convex-combination hull: every ewma lies within the customer's
    // trailing-16 min..max of raw totals (weights are positive, sum to 1)
    byCust.values.foreach { rs =>
      rs.indices.foreach { i =>
        val frame = rs.slice(math.max(0, i - 15), i + 1).map(r => totals(r.getLong(iK)))
        val e = rs(i).getDouble(iE)
        assert(e >= frame.min - 1e-6 && e <= frame.max + 1e-6,
          s"ewma $e escaped frame hull [${frame.min}, ${frame.max}]")
      }
    }
    // recency dominance: the current row's weight (1/den >= 1/2) exceeds all
    // older weights combined, so ewma always lands in the half-interval
    // between the current value and the previous row's ewma
    byCust.values.foreach { rs =>
      rs.indices.drop(1).foreach { i =>
        if (i <= 15) { // exact recurrence only while the frame still grows
          val x = totals(rs(i).getLong(iK))
          val prev = rs(i - 1).getDouble(iE)
          val lo = math.min(x, prev) - 1e-6
          val hi = math.max(x, prev) + 1e-6
          val e = rs(i).getDouble(iE)
          assert(e >= lo && e <= hi, s"ewma $e outside [$lo, $hi]")
        }
      }
    }
  }

  test("window_share: shares sum to 1 and follow the revenue ratios, no global window (E9)") {
    val df = graft.operators.Windows.windowShare(spark, sfDir)
    val rows = df.collect()
    val shares = rows.map(_.getDouble(rows.head.fieldIndex("share")))
    assert(math.abs(shares.sum - 1.0) < 1e-4, s"shares sum ${shares.sum}")
    val revs = rows.map(_.getDouble(rows.head.fieldIndex("revenue")))
    val total = revs.sum
    rows.indices.foreach { i =>
      assert(math.abs(shares(i) - revs(i) / total) < 1e-4)
    }
    // the scale point: the plan carries no unpartitioned window at all
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "ratio-to-report must not plan a global window")
  }

  test("join_fuzzy: FastSS blocking equals the brute-force all-pairs answer " +
       "on the fixture (recall-1.0 proof, retired from the oracle in r15)") {
    // the registered oracle now replays the linear FastSS chain so the
    // 10x/100x gates can run it; THIS test carries the recall proof the
    // quadratic oracle used to provide — driver-side textbook DP over the
    // full fixture cross product, compared set-exactly
    val names = Tables.customer(spark, SparkTestSession.sfDir)
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)(
        (i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val want = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb
      dist = lev(na, nb) if dist <= 1
    } yield (ka, kb, na, nb, dist)).toSet
    val got = graft.operators.Joins.joinFuzzy(spark, SparkTestSession.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getInt(4))).toSet
    assert(want.nonEmpty, "fuzzy recall proof vacuous on the fixture")
    assert(got == want,
      s"blocking missed ${(want diff got).take(3)} / over-emitted ${(got diff want).take(3)}")
  }
}
