package graft

import java.sql.Timestamp
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** mapGroupsWithState: state must persist ACROSS streaming triggers (the
  * property batch execution cannot show) and the final streamed state must
  * equal the batch fold of the same events.
  */
class StatefulOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("state accumulates across triggers and matches the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq(
      UserEvent(1L, ts("2024-01-01 10:00:00"), 1.10),
      UserEvent(2L, ts("2024-01-01 10:01:00"), 2.00))
    val batch2 = Seq(
      UserEvent(1L, ts("2024-01-01 11:00:00"), 0.15),
      UserEvent(1L, ts("2024-01-01 09:00:00"), 3.00))

    val stream = MemoryStream[UserEvent]
    val q = StatefulOps.profileStreamQuery(stream.toDS(), "stateful_t")
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    // memory sink in Update mode appends each refresh; take the last
    // emitted profile per user = final state
    val fromStream = spark.table("stateful_t")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) => u -> rows.maxBy(_.getLong(1)) }

    val u1 = fromStream(1L)
    assert(u1.getLong(1) == 3L)                       // n_events across triggers
    assert(u1.getLong(2) == 425L)                     // 110 + 15 + 300 cents
    assert(u1.getTimestamp(3) == ts("2024-01-01 09:00:00")) // first_ts updated by batch2
    assert(u1.getTimestamp(4) == ts("2024-01-01 11:00:00"))

    // batch fold of the union equals the streamed final state
    val batchProfiles = StatefulOps.profile((batch1 ++ batch2).toDS())
      .collect().map(p => p.user_id -> p).toMap
    assert(batchProfiles(1L).n_events == 3L && batchProfiles(1L).sum_cents == 425L)
    assert(batchProfiles(2L).n_events == 1L && batchProfiles(2L).sum_cents == 200L)
  }

  test("stream_upsert: stale version in a later trigger cannot regress the state (J13)") {
    import spark.implicits._
    import StatefulOps.VersionedRow
    implicit val sqlCtx = spark.sqlContext

    // seq 3 arrives in trigger 1; the STALE seq 2 arrives in trigger 2 —
    // last-writer-wins must keep seq 3 (overwrite-on-arrival would regress)
    val stream = MemoryStream[VersionedRow]
    val q = StatefulOps.upsertStreamQuery(stream.toDS(), "upsert_t")
    try {
      stream.addData(VersionedRow(1L, 3L, 300.0), VersionedRow(2L, 1L, 100.0))
      q.processAllAvailable()
      stream.addData(VersionedRow(1L, 2L, 200.0), VersionedRow(2L, 2L, 110.0))
      q.processAllAvailable()
    } finally q.stop()

    val finalByKey = spark.table("upsert_t").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.maxBy(_.getLong(1)).getLong(1) }
    assert(finalByKey(1L) == 3L, "stale seq 2 regressed key 1 past seq 3")
    assert(finalByKey(2L) == 2L, "fresh seq 2 must supersede seq 1 on key 2")

    // batch fold of the union equals the streamed final state
    val batch = StatefulOps.latest(Seq(
      VersionedRow(1L, 3L, 300.0), VersionedRow(1L, 2L, 200.0),
      VersionedRow(2L, 1L, 100.0), VersionedRow(2L, 2L, 110.0)).toDS())
      .collect().map(r => r.key -> r.seq).toMap
    assert(batch == Map(1L -> 3L, 2L -> 2L))
  }

  test("flatMapGroupsWithState sessionizer: a session spanning triggers closes once, " +
       "via gap in-band or event-time timeout") {
    import spark.implicits._
    import StatefulOps.SessionEvent
    implicit val sqlCtx = spark.sqlContext

    // user 1: two events 5 min apart split across triggers (same session),
    // then a third 20 min later (gap ≥ 10 min → closes session 1 in-band).
    // user 2: one event, closed only by the watermark-driven timeout.
    val stream = MemoryStream[SessionEvent]
    val q = StatefulOps.sessionizeStreamQuery(stream.toDS(), "sessionize_t")
    try {
      stream.addData(
        SessionEvent(1L, ts("2024-01-01 10:00:00"), 1L, 1.00),
        SessionEvent(2L, ts("2024-01-01 10:00:00"), 2L, 5.00))
      q.processAllAvailable()
      stream.addData(SessionEvent(1L, ts("2024-01-01 10:05:00"), 3L, 2.00))
      q.processAllAvailable()
      stream.addData(SessionEvent(1L, ts("2024-01-01 10:25:00"), 4L, 4.00))
      q.processAllAvailable()
      // advance the watermark far past every open session's timeout so the
      // trailing sessions flush deterministically
      stream.addData(SessionEvent(99L, ts("2024-01-01 12:00:00"), 5L, 0.01))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("sessionize_t")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getLong(4)))
    // user 1 session 1 merged across triggers: 10:00–10:05, 2 events, 300 cents
    assert(rows.contains((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0", 2L, 300L)))
    // user 2's single-event session flushed by timeout
    assert(rows.contains((2L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0", 1L, 500L)))

    // batch entry over the same events equals the oracle's session set
    val batch = Seq(
      SessionEvent(1L, ts("2024-01-01 10:00:00"), 1L, 1.00),
      SessionEvent(1L, ts("2024-01-01 10:05:00"), 3L, 2.00),
      SessionEvent(1L, ts("2024-01-01 10:25:00"), 4L, 4.00)).toDS()
    val (closed, open) = StatefulOps.foldSessions(batch.collect().toSeq, None)
    assert(closed.map(o => (o.n_events, o.sum_cents)) == Seq((2L, 300L)))
    assert(open.exists(o => o.n_events == 1L && o.sum_cents == 400L))
  }

  test("transformWithState top-N: ListState merges across triggers (RocksDB store)") {
    import spark.implicits._
    import StatefulOps.TopEvent
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store in streaming
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[TopEvent]
    val q = StatefulOps.topnStreamQuery(stream.toDS(), "topn_t")
    try {
      stream.addData(TopEvent(1L, 10L, 5.0), TopEvent(1L, 11L, 9.0), TopEvent(1L, 12L, 1.0))
      q.processAllAvailable()
      // trigger 2: one value displaces the old rank-3, one ties rank-1 by
      // value and loses the event_id tiebreak
      stream.addData(TopEvent(1L, 13L, 7.0), TopEvent(1L, 14L, 9.0))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    // Update-mode memory sink appends per trigger; the last 3 rows are the
    // final ranking: state (9.0, 7.0) survived and merged with trigger 2
    val last = spark.table("topn_t").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .takeRight(3).toSeq
    assert(last == Seq((1L, 1, 11L, 9.0), (1L, 2, 14L, 9.0), (1L, 3, 13L, 7.0)))
  }

  test("transformWithState batch entry equals the rank-window oracle shape") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = StatefulOps.streamTopnState(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = Tables.events(spark, SparkTestSession.sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))).cast("int"))
      .filter(col("rn") <= StatefulOps.TopNPerUser)
      .select(col("user_id"), col("rn"), col("event_id"), col("value"))
      .orderBy("user_id", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("funnel fold: stages fill across triggers and match the incremental batch form") {
    import spark.implicits._
    import StatefulOps.FunnelEvent
    implicit val sqlCtx = spark.sqlContext

    // user 1 completes the funnel across three triggers (in event-time
    // order, the streaming delivery contract); user 2's click arrives
    // OUTSIDE the 60-minute window and must never fill the stage; user 3
    // clicks BEFORE viewing - the strict > bound rejects it.
    val stream = MemoryStream[FunnelEvent]
    val q = StatefulOps.funnelStreamQuery(stream.toDS(), "funnel_t")
    try {
      stream.addData(
        FunnelEvent(1L, "view", ts("2024-01-01 10:00:00")),
        FunnelEvent(2L, "view", ts("2024-01-01 10:00:00")),
        FunnelEvent(3L, "click", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      stream.addData(
        FunnelEvent(1L, "click", ts("2024-01-01 10:30:00")),
        FunnelEvent(2L, "click", ts("2024-01-01 11:30:00")), // > 60 min after view
        FunnelEvent(3L, "view", ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      stream.addData(FunnelEvent(1L, "purchase", ts("2024-01-01 10:45:00")))
      q.processAllAvailable()
    } finally q.stop()

    // Update-mode memory sink appends each refresh; the LAST row per user
    // is the final state (rows arrive in trigger order)
    val fin = spark.table("funnel_t").collect()
      .zipWithIndex.groupBy(_._1.getLong(0))
      .map { case (u, rows) => u -> rows.maxBy(_._2)._1.getStruct(1) }

    assert(fin(1L).getTimestamp(0) == ts("2024-01-01 10:00:00"))
    assert(fin(1L).getTimestamp(1) == ts("2024-01-01 10:30:00"))
    assert(fin(1L).getTimestamp(2) == ts("2024-01-01 10:45:00"))
    assert(fin(2L).getTimestamp(1) == null, "out-of-window click filled the stage")
    assert(fin(3L).getTimestamp(1) == null, "click before view filled the stage")

    // the registered batch query over the full testdata agrees with the
    // join-chain form row-for-row (same oracle, asserted engine-side too)
    val a = graft.operators.EventOps.funnelEvents(spark, SparkTestSession.sfDir).collect()
    val b = graft.streaming.StatefulOps.streamFunnel(spark, SparkTestSession.sfDir).collect()
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y },
      s"join-chain and stateful funnels disagree: ${a.length}/${b.length}")
  }

  test("dedup_ttl: typed fold equals the window-islands form verdict-for-verdict (J15)") {
    import org.apache.spark.sql.functions.col
    val want = graft.operators.EventOps.dedupTtl(spark, SparkTestSession.sfDir)
      .select("event_id", "burst", "kept").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val got = graft.streaming.StatefulOps.dedupTtlTyped(spark, SparkTestSession.sfDir)
      .select("event_id", "burst", "kept").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got.size == want.size, s"${got.size} vs ${want.size}")
    assert(got == want)
    // non-vacuity: both verdict branches carry real mass
    val kepts = want.values.map(_._2).toSeq
    assert(kepts.contains(1) && kepts.contains(0), "a verdict branch is vacuous")
  }

  test("stream_matview: deltas split across triggers accumulate to the batch total; batch fold == streamed final state (J16)") {
    import spark.implicits._
    import StatefulOps.{MvDelta, MvState}
    implicit val sqlCtx = spark.sqlContext

    // group 1: +250 cents insert in trigger 1, then a -100-cent update and
    // a delete (-150, dn -1) in trigger 2; group 2 changes only in trigger 2
    val stream = MemoryStream[MvDelta]
    val q = StatefulOps.matviewStreamQuery(stream.toDS(), "mv_t")
    try {
      stream.addData(MvDelta(1L, 250L, 1L))
      q.processAllAvailable()
      // only one trigger has run, so the table holds exactly its emission —
      // no cross-trigger ordering assumption (round-11 ADVICE #5: the
      // Update-mode memory sink does not contractually guarantee collect
      // returns rows in trigger order)
      val mid = spark.table("mv_t").collect()
        .filter(_.getLong(0) == 1L).map(r => (r.getLong(1), r.getLong(2))).toSeq
      assert(mid == Seq((250L, 1L)), s"trigger-1 state $mid")
      stream.addData(MvDelta(1L, -100L, 0L), MvDelta(1L, -150L, -1L), MvDelta(2L, 500L, 1L))
      q.processAllAvailable()
    } finally q.stop()
    // order-free cross-trigger check: each group's accumulated emissions as
    // a SET (the per-trigger states differ by construction, so the set
    // pins both the trigger-1 and the trigger-2 value without relying on
    // sink row order)
    val fin = spark.table("mv_t").collect().groupBy(_.getLong(0))
      .map { case (g, rows) => g -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet }
    assert(fin(1L) == Set((250L, 1L), (0L, 0L)),
      s"group 1 cross-trigger emissions ${fin(1L)}")
    assert(fin(2L) == Set((500L, 1L)), s"group 2 state ${fin(2L)}")

    // batch fold of the union equals the streamed final state
    val batch = StatefulOps.mvMaintain(Seq(
      MvDelta(1L, 250L, 1L), MvDelta(1L, -100L, 0L), MvDelta(1L, -150L, -1L),
      MvDelta(2L, 500L, 1L)).toDS())
      .collect().map(s => s.group -> ((s.sum_cents, s.n))).toMap
    assert(batch == Map(1L -> ((0L, 0L)), 2L -> ((500L, 1L))))

    // and the registered batch entry agrees with matview_delta's journal
    // deltas on the real fixture (the M9 twin law)
    val twin = StatefulOps.streamMatview(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val m9 = graft.operators.Lakehouse.matviewDelta(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(r.fieldIndex("delta_sum")), r.getLong(r.fieldIndex("delta_n"))))).toMap
    assert(twin == m9, "stream twin deltas drift from matview_delta's journal")
  }

  test("anomaly fold: flags across triggers == batch == window form (E11/J17)") {
    import spark.implicits._
    import StatefulOps.AnomEvent
    implicit val sqlCtx = spark.sqlContext

    // user 1: five flat prior values (cents=1000), then a spike at t6 —
    // the spike must flag with n_prior=5 EVEN THOUGH the prior history and
    // the spike arrive in different triggers (state carries the moments);
    // the sixth flat value must NOT flag. Baseline needs nonzero variance
    // (one 1001) or the RHS is 0 and any deviation trips — we want a
    // genuine 3-sigma test, not a constant-detector.
    val base = Seq(1000L, 1001L, 1000L, 1000L, 1000L).zipWithIndex.map {
      case (c, i) => AnomEvent(1L, i + 1L, ts(s"2024-01-01 10:0$i:00"), c)
    }
    val stream = MemoryStream[AnomEvent]
    val q = StatefulOps.anomalyStreamQuery(stream.toDS(), "anom_t")
    try {
      stream.addData(base: _*)
      q.processAllAvailable()
      stream.addData(
        AnomEvent(1L, 6L, ts("2024-01-01 10:06:00"), 5000L),
        AnomEvent(1L, 7L, ts("2024-01-01 10:07:00"), 1000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("anom_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == Set((1L, 6L, 5L)), s"cross-trigger flags: $got")

    // the registered stateful entry agrees with the window form
    // row-for-row on the real fixture, and flags real mass
    val w = graft.operators.EventOps.anomalyRunning(spark, SparkTestSession.sfDir)
      .collect().map(_.toSeq).toSeq
    val f = StatefulOps.streamAnomaly(spark, SparkTestSession.sfDir)
      .collect().map(_.toSeq).toSeq
    assert(w == f, s"window and stateful anomaly forms disagree: ${w.length}/${f.length}")
    assert(w.nonEmpty, "anomaly gate vacuous on the fixture")
  }

  test("anomaly fold: a late-arriving event is scored against already-folded " +
       "successors — the documented J17 in-order-arrival assumption") {
    import spark.implicits._
    import StatefulOps.{AnomEvent, AnomState}
    implicit val sqlCtx = spark.sqlContext

    // trigger 1 folds five flat values; trigger 2 delivers a spike whose
    // EVENT TIME precedes three of them. The fold scores it against the
    // full five-event state (n_prior = 5 → flags), while the in-event-
    // time-order fold of the same six events sees only two strict
    // predecessors at the spike (< AnomalyMinPrior → no flag). This test
    // pins the divergence the streamAnomaly scaladoc documents.
    val base = Seq(1000L, 1001L, 1000L, 1000L, 1000L).zipWithIndex.map {
      case (c, i) => AnomEvent(9L, i + 1L, ts(s"2024-01-01 10:0$i:00"), c)
    }
    val late = AnomEvent(9L, 6L, ts("2024-01-01 10:01:30"), 5000L)
    val stream = MemoryStream[AnomEvent]
    val q = StatefulOps.anomalyStreamQuery(stream.toDS(), "anom_late_t")
    try {
      stream.addData(base: _*)
      q.processAllAvailable()
      stream.addData(late)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("anom_late_t").collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(got == Set((6L, 5L)), s"late-event flags (event_id, n_prior): $got")
    val (rows, _) = StatefulOps.foldAnomalies(base :+ late, AnomState(0L, 0L, 0L))
    assert(rows.isEmpty,
      s"in-event-time-order fold of the same events unexpectedly flagged: $rows")
  }

  test("kmv fold: sketch is invariant to trigger splits and arrival order, and matches the batch k-min (J18)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import StatefulOps.KmvHash
    implicit val sqlCtx = spark.sqlContext

    // the real fixture's distinct (lang, hv) rows, independently derived
    val rows = graft.Tables.documents(spark, SparkTestSession.sfDir)
      .select(col("lang"),
        explode(array_distinct(graft.operators.TextOps.shingles(col("text"), 3))).as("g"))
      .select(col("lang"),
        conv(substring(md5(col("g").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("hv"))
      .distinct().as[KmvHash].collect().toSeq
    val want = rows.groupBy(_.lang).view.mapValues { hs =>
      val k = hs.map(_.hv).distinct.sorted.take(graft.operators.Aggregates.KmvK)
      (k.size, k.max)
    }.toMap

    // stream the SAME hashes split across two triggers in reversed order —
    // the folded sketch must be identical (pure function of the set)
    val (a, b) = rows.reverse.splitAt(rows.length / 3)
    val stream = MemoryStream[KmvHash]
    val q = StatefulOps.kmvStreamQuery(stream.toDS(), "kmv_t")
    try {
      stream.addData(a: _*); q.processAllAvailable()
      stream.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    // update-mode sink: last row per lang is the final state
    val fin = spark.table("kmv_t").collect().zipWithIndex
      .groupBy(_._1.getString(0))
      .map { case (l, rs) =>
        val r = rs.maxBy(_._2)._1; l -> ((r.getInt(1), r.getLong(2)))
      }
    assert(fin == want, s"streamed sketch drifted: $fin vs $want")

    // and the registered batch entry agrees
    val batch = StatefulOps.streamKmv(spark, SparkTestSession.sfDir).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(batch == want, s"batch entry drifted: $batch vs $want")
  }
}
