package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-6 event-analytics operators (funnel, retention).
  * The oracle proves value equality with DuckDB; these tests pin the
  * SEMANTIC invariants a refactor could silently break while still
  * agreeing with a co-edited oracle.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("funnel_events: stage ordering and the 60-minute bound hold row-wise (J9)") {
    val rows = EventOps.funnelEvents(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val hourUs = 60L * 60 * 1000000
    rows.foreach { r =>
      // full-precision micros: getTime is millis-truncated, the sub-ms
      // digits live in getNanos (every fixture ts has them)
      val vts = r.getTimestamp(1)
      val viewUs = Math.floorDiv(vts.getTime, 1000L) * 1000000L + vts.getNanos / 1000L
      val click = Option(r.get(2)).map(_.asInstanceOf[Long])
      val purchase = Option(r.get(3)).map(_.asInstanceOf[Long])
      val depth = r.getInt(4)
      assert(depth == 1 + click.size + purchase.size, s"depth mismatch: $r")
      // a purchase stage without a click stage is impossible by construction
      if (purchase.isDefined) assert(click.isDefined, s"purchase without click: $r")
      click.foreach { c =>
        assert(c > viewUs && c <= viewUs + hourUs, s"click outside (view, view+60m]: $r")
      }
      purchase.foreach { p =>
        assert(p > click.get && p <= click.get + hourUs, s"purchase outside (click, click+60m]: $r")
      }
    }
    // the funnel is monotone: each stage keeps a subset of the previous
    val d1 = rows.length
    val d2 = rows.count(_.getInt(4) >= 2)
    val d3 = rows.count(_.getInt(4) == 3)
    assert(d1 >= d2 && d2 >= d3, s"funnel not monotone: $d1/$d2/$d3")
    // every user with any view appears exactly once
    val nViewUsers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(d1.toLong == nViewUsers, s"rows=$d1 view-users=$nViewUsers")
  }

  test("window_sessionid: per-user max sid equals stream_session's session count (E6)") {
    val sidMax = EventOps.windowSessionId(spark, sfDir)
      .groupBy("user_id").agg(max("sid").as("m")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nSessions = EventOps.streamSession(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sidMax.keySet == nSessions.keySet)
    sidMax.foreach { case (u, m) =>
      assert(m.toLong == nSessions(u),
        s"user $u: max sid $m != ${nSessions(u)} sessions from session_window")
    }
  }

  test("event_retention: offset-0 equals cohort size and later offsets never exceed it (J10)") {
    val rows = EventOps.eventRetention(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    assert(rows.keys.forall(_._2 >= 0), "negative day offset")
    val cohorts = rows.keys.map(_._1).toSet
    cohorts.foreach { c =>
      val day0 = rows.getOrElse((c, 0), 0L)
      assert(day0 > 0, s"cohort $c missing its offset-0 row")
      rows.filter(_._1._1 == c).foreach { case ((_, off), n) =>
        assert(n <= day0, s"cohort $c offset $off: $n > cohort size $day0")
      }
    }
    // cohort sizes partition the user base: sums match total distinct users
    val totalUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    val sumCohorts = cohorts.toSeq.map(c => rows((c, 0))).sum
    assert(sumCohorts == totalUsers, s"cohorts sum $sumCohorts != users $totalUsers")
  }

  test("anomaly_mad: non-vacuous, every flag clears z>3, flags are a strict minority") {
    val out = EventOps.anomalyMad(spark, sfDir).collect()
    assert(out.nonEmpty, "vacuous outlier fixture — no row clears the MAD fence")
    out.foreach { r =>
      val z = r.getDouble(r.fieldIndex("robust_z"))
      assert(z > 3.0 - 1e-9, s"flagged row with robust_z $z <= 3")
      assert(r.getDouble(r.fieldIndex("mad_val")) > 0.0, "MAD must be positive where flags exist")
    }
    val total = Tables.events(spark, sfDir).count()
    assert(out.length < total / 4,
      s"${out.length} of $total rows flagged — the robust fence is not a fence")
  }

  test("event_twap matches a brute-force held-interval mean and stays in value bounds (J14)") {
    val got = EventOps.eventTwap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getDouble(r.fieldIndex("twap"))).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
    val byDay = ev.groupBy { case (u, _, ts, _) =>
      (u, java.sql.Timestamp.valueOf(ts.toLocalDateTime.toLocalDate.atStartOfDay))
    }
    byDay.foreach { case (key, rows) =>
      // getTime already carries millis and getNanos the FULL fractional
      // second — micros must not double-count the millis
      def micros(t: java.sql.Timestamp): Long =
        math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
      val sorted = rows.sortBy(e => (micros(e._3), e._2))
      val held = sorted.init.zip(sorted.tail).map { case (a, b) =>
        (math.round(a._4 * 100), micros(b._3) - micros(a._3))
      }.filter(_._2 >= 0)
      val den = held.map(_._2).sum
      if (den > 0) {
        val want = held.map { case (c, dt) => c.toDouble * dt }.sum / den / 100
        val twap = got.getOrElse(key, fail(s"group $key missing from event_twap"))
        assert(math.abs(twap - want) < 1e-4, s"$key: twap $twap vs brute $want")
        val (lo, hi) = (held.map(_._1).min / 100.0, held.map(_._1).max / 100.0)
        assert(twap >= lo - 1e-9 && twap <= hi + 1e-9, s"$key: twap $twap outside [$lo, $hi]")
      } else assert(!got.contains(key), s"$key: zero-span group must be excluded")
    }
  }

  test("join_interval: both overlap branches non-vacuous; error-bearing sessions always hit") {
    val rows = EventOps.joinInterval(spark, sfDir).collect()
    val n = rows.map(_.getLong(rows.head.fieldIndex("n_incidents")))
    assert(n.exists(_ > 0) && n.contains(0L),
      "fixture must exercise both overlapping and clear sessions")
    // a session containing an error event overlaps its own incident window
    val errUsers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000))
    val byUser = rows.groupBy(_.getLong(0))
    errUsers.foreach { case (u, tsUs) =>
      val hosting = byUser(u).find(r =>
        r.getLong(r.fieldIndex("s_start_us")) <= tsUs &&
        tsUs <= r.getLong(r.fieldIndex("s_end_us")))
      hosting.foreach(r =>
        assert(r.getLong(r.fieldIndex("n_incidents")) > 0,
          s"user $u session hosts an error but counts 0 incidents"))
    }
  }
  test("event_markov: rows sum to src totals and transitions conserve the stream (E12)") {
    val rows = EventOps.eventMarkov(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 25, s"shape: ${rows.length}")
    // per-src counts sum exactly to the carried src_total
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val total = rs.head._4
      assert(rs.forall(_._4 == total), s"$src carries mixed totals")
      assert(rs.map(_._3).sum == total, s"$src counts do not sum to total")
    }
    // conservation: total transitions = total events - one terminal per user
    val ev = Tables.events(spark, sfDir)
    val want = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == want,
      s"transition mass ${rows.map(_._3).sum} != events-minus-terminals $want")
  }
}
