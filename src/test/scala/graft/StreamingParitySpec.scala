package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** J4 batch/stream parity: the tumbling-window aggregation produces the same
  * result under Structured Streaming (`MemoryStream`) as in batch, because
  * both run the same `window()` expression — the property EventOps' Scaladoc
  * claims. Also exercises `withWatermark` late-data dropping in append mode.
  */
class StreamingParitySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val rows = Seq(
    (ts("2024-01-01 10:05:00"), "click", 1.0),
    (ts("2024-01-01 10:45:00"), "click", 2.0),
    (ts("2024-01-01 10:50:00"), "view", 4.0),
    (ts("2024-01-01 11:10:00"), "click", 8.0),
  )

  test("tumbling window aggregation: MemoryStream result == batch result (J1/J4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def aggregate(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv"))

    val batch = aggregate(rows.toDF("ts", "event_type", "value"))
      .orderBy("ws", "event_type").collect().toSeq

    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows: _*)
    val q = aggregate(stream.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("parity_t").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("parity_t")
      .orderBy("ws", "event_type").collect().toSeq

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("sliding window aggregation: MemoryStream result == batch result (J2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def aggregate(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
        .select(col("window.start").as("ws"), col("n"), col("sv"))

    val batch = aggregate(rows.toDF("ts", "event_type", "value"))
      .orderBy("ws").collect().toSeq

    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows: _*)
    val q = aggregate(stream.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("parity_sl").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("parity_sl").orderBy("ws").collect().toSeq

    assert(streamed == batch)
    // 4 windows/row at a 1h/15m slide — the overlap must materialize
    assert(batch.size >= 4)
  }

  test("session window per user: MemoryStream result == batch result (J3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // u1: two events 5m apart (one session), then a 25m gap (new session);
    // u2: a single event. Same 10m gap as EventOps.streamSession.
    val sessionRows = Seq(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:05:00"), 1L, 2.0),
      (ts("2024-01-01 10:30:00"), 1L, 4.0),
      (ts("2024-01-01 10:02:00"), 2L, 8.0))
    // session_window streaming runs APPEND mode (complete is unsupported
    // for session merges): a session emits only once the watermark passes
    // its end, and the watermark both updates AFTER a batch and gates
    // emission in the NEXT one — so two next-day flusher batches close
    // every real session (flushers filtered from the comparison)
    val flush1 = (ts("2024-01-02 00:00:00"), 9L, 0.0)
    val flush2 = (ts("2024-01-02 00:20:00"), 9L, 0.0)

    def aggregate(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum("value").as("sv"))
        .select(col("session_window.start").as("ss"), col("user_id"),
          col("n_events"), col("sv"))

    val batch = aggregate(sessionRows.toDF("ts", "user_id", "value"))
      .orderBy("user_id", "ss").collect().toSeq

    val stream = MemoryStream[(Timestamp, Long, Double)]
    val q = aggregate(stream.toDF.toDF("ts", "user_id", "value")
        .withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("parity_sess").outputMode("append").start()
    try {
      stream.addData(sessionRows: _*); q.processAllAvailable()
      stream.addData(flush1); q.processAllAvailable()
      stream.addData(flush2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity_sess").filter(col("user_id") =!= 9L)
      .orderBy("user_id", "ss").collect().toSeq

    assert(streamed == batch)
    // u1 must split into two sessions across the 25m gap
    assert(batch.count(_.getLong(1) == 1L) == 2)
  }

  test("keep-first dedup: streaming dropDuplicates across triggers == batch keep-first (J5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // dedup_state's contract: batch keep-first over (earliest ts, event_id)
    // equals streaming dropDuplicates when arrival order is the event-time
    // order — feed the rows in that order across TWO triggers, so the
    // state must persist between micro-batches to suppress the later dup
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click"),
      (2L, ts("2024-01-01 10:01:00"), 7L, "view"),
      (3L, ts("2024-01-01 10:02:00"), 8L, "click"),
      (4L, ts("2024-01-01 10:03:00"), 7L, "click"), // dup of (7, click)
      (5L, ts("2024-01-01 10:04:00"), 8L, "click")) // dup of (8, click)
    val batch = evs.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy(asc("ts"), asc("event_id"))))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("user_id", "event_type").collect().toSeq

    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    val q = stream.toDF.toDF("event_id", "ts", "user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
      .writeStream.format("memory").queryName("parity_dd").outputMode("append").start()
    try {
      stream.addData(evs.take(3): _*); q.processAllAvailable()
      stream.addData(evs.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity_dd")
      .orderBy("user_id", "event_type").collect().toSeq

    assert(streamed == batch)
    assert(batch.size == 3 && evs.size == 5, "dups must actually be suppressed")
  }

  test("decontaminate is streamable at ingest: per-doc flags on a stream == batch audit") {
    import graft.operators.TextOps
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkTestSession.sfDir
    // The benchmark gram set is fixed at ingest time → collect once and bake
    // it into the (stateless!) per-row check: n_hit = |hv ∩ evalGrams|.
    // array_intersect over the distinct hashed-shingle array counts exactly
    // what the batch audit's explode→broadcast-join counts, so an ingest
    // pipeline can flag contaminated docs per micro-batch with NO state.
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val evalGrams = docs
      .filter(pmod(col("doc_id"), lit(TextOps.DecontamModulus)) === 0)
      .select(explode(TextOps.hashedShingles(col("text"), TextOps.DecontamShingleN)).as("g"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val evalLit = typedLit(evalGrams)

    def flags(df: org.apache.spark.sql.DataFrame) = df
      .filter(pmod(col("doc_id"), lit(TextOps.DecontamModulus)) =!= 0)
      .select(col("doc_id"),
        size(array_intersect(
          TextOps.hashedShingles(col("text"), TextOps.DecontamShingleN), evalLit))
          .cast("long").as("n_hit"))

    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.as[(Long, String)].collect().toSeq: _*)
    val q = flags(stream.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("parity_decon").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("parity_decon")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch oracle-checked operator gives the same per-doc hit counts
    val batch = TextOps.decontaminate(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_hit"))).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // contamination must actually be PRESENT, or the parity above is vacuous
    // (sf0.001 has 2 planted contaminated docs; round-3 ADVICE: the previous
    // `exists || nonEmpty` was a tautology)
    assert(batch.values.exists(_ > 0L), "no contaminated doc — parity check vacuous")
  }

  test("sample_split is streamable at ingest: stream labels == batch labels") {
    // the split label is a pure function of doc_id — an ingest pipeline can
    // stamp train/val/test per micro-batch and NEVER disagree with the
    // batch assignment (the property that prevents val→train leakage)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkTestSession.sfDir
    val docs = Tables.documents(spark, dir).select("doc_id", "lang")

    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.as[(Long, String)].collect().toSeq: _*)
    val streamedDf = stream.toDF.toDF("doc_id", "lang")
    val q = graft.operators.Relational.splitLabeled(streamedDf)
      .select("doc_id", "split")
      .writeStream.format("memory").queryName("parity_split").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("parity_split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val batch = graft.operators.Relational.sampleSplit(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("split"))).toMap
    assert(streamed == batch)
    // 50 docs at sf0.001: train certainly present; val/test (5% each) may
    // legitimately be empty — presence proportions are RelationalSpec's law
    assert(streamed.values.toSet.contains("train"))
  }

  test("sample_mix is streamable at ingest: kept rows on a stream == batch sampler") {
    // the mixing decision is a pure function of (doc_id, lang) — no state,
    // no shuffle — so an ingest pipeline can apply data-mixing weights per
    // micro-batch and keep EXACTLY the rows the batch sampler keeps
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkTestSession.sfDir
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars")

    val stream = MemoryStream[(Long, String, String, Long)]
    stream.addData(docs.as[(Long, String, String, Long)].collect().toSeq: _*)
    val streamedDf = stream.toDF.toDF("doc_id", "lang", "source", "n_chars")
    // the SAME operator core runs on the streaming frame — no test-local
    // reimplementation to drift
    val q = graft.operators.Relational.mixKept(streamedDf)
      .select("doc_id")
      .writeStream.format("memory").queryName("parity_mix").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("parity_mix").collect().map(_.getLong(0)).toSet

    val batch = graft.operators.Relational.sampleMix(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream time-range join: MemoryStream purchases x clicks == batch stream_join (J8)") {
    import graft.operators.EventOps
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkTestSession.sfDir

    val ev = Tables.events(spark, dir)
      .select("event_id", "user_id", "ts", "event_type")
      .as[(Long, Long, Timestamp, String)].collect().toSeq

    val pStream = MemoryStream[(Long, Long, Timestamp)]
    val cStream = MemoryStream[(Long, Long, Timestamp)]
    pStream.addData(ev.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3)): _*)
    cStream.addData(ev.filter(_._4 == "click").map(e => (e._1, e._2, e._3)): _*)

    // the streaming form of EventOps.streamJoin's predicate: user equality +
    // bounded time range, watermarks on both sides so the engine can expire
    // buffered click state once the range bound has passed
    val p = pStream.toDF.toDF("event_id", "user_id", "ts").withWatermark("ts", "1 hour")
    val c = cStream.toDF.toDF("c_id", "c_user", "c_ts").withWatermark("c_ts", "1 hour")
    val joined = p.join(c,
      col("user_id") === col("c_user") &&
      col("c_ts") >= col("ts") - expr("INTERVAL 10 MINUTES") &&
      col("c_ts") < col("ts"))
      .select("event_id", "c_id")
    val q = joined.writeStream.format("memory").queryName("parity_ssj")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    // inner-join pair counts per purchase; purchases with no pair = 0 clicks
    val streamed = spark.table("parity_ssj").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val batch = EventOps.streamJoin(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_clicks_10m"))).toMap
    assert(batch.nonEmpty && batch.values.exists(_ > 0L),
      "no attributed purchase in testdata — parity vacuous")
    batch.foreach { case (id, n) =>
      assert(streamed.getOrElse(id, 0L) == n, s"purchase $id: stream ${streamed.get(id)} batch $n")
    }
    assert(streamed.keySet.subsetOf(batch.keySet))
  }

  test("file-source streaming: readStream over a growing parquet dir == batch (A-series/J1)") {
    import spark.implicits._
    val dir = "/tmp/graft_test_stream_src"
    val (batch1, batch2) = (rows.take(2), rows.drop(2))

    def aggregate(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv"))

    val schema = batch1.toDF("ts", "event_type", "value").schema
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    batch1.toDF("ts", "event_type", "value").write.parquet(dir)

    val q = aggregate(spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("fsrc_t").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // a second file lands in the directory mid-stream — the file source
      // must pick it up on the next trigger
      batch2.toDF("ts", "event_type", "value").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("fsrc_t").orderBy("ws", "event_type").collect().toSeq
    val batch = aggregate(rows.toDF("ts", "event_type", "value"))
      .orderBy("ws", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("file-source STATEFUL streaming: mapGroupsWithState KMV over a growing " +
       "parquet dir == the registered batch entry (J18 ingest shape, r15)") {
    // round-14 VERDICT #5: every stateful op proved parity via MemoryStream
    // only; this drives one (stream_kmv's fold) through the production
    // ingest entry point — readStream.format(parquet) DIRECTORY DISCOVERY —
    // with a second file landing mid-stream, and requires the final per-key
    // states to equal the registered batch form on the real fixture
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.KmvHash
    val src = "/tmp/graft_test_kmv_stream_src"
    val hashRows = graft.operators.Aggregates
      .kmvHashes(spark, SparkTestSession.sfDir).as[KmvHash].collect().toSeq
    val (b1, b2) = hashRows.splitAt(hashRows.length / 2)
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val schema = b1.toDF("lang", "hv").schema
    b1.toDF("lang", "hv").write.parquet(src)
    val q = StatefulOps.kmvStreamQuery(
      spark.readStream.schema(schema).parquet(src).as[KmvHash], "kmv_fsrc_t")
    try {
      q.processAllAvailable()
      b2.toDF("lang", "hv").write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    // update-mode sink: last row per lang is the final state
    val fin = spark.table("kmv_fsrc_t").collect().zipWithIndex
      .groupBy(_._1.getString(0))
      .map { case (l, rs) =>
        val r = rs.maxBy(_._2)._1; l -> ((r.getInt(1), r.getLong(2)))
      }
    val batch = StatefulOps.streamKmv(spark, SparkTestSession.sfDir).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(batch.nonEmpty, "file-stream KMV parity vacuous")
    assert(fin == batch, s"file-stream KMV drifted: $fin vs $batch")
  }

  test("minhash dedup streaming twin: bucket-state fold across triggers == batch pairs (K2 ingest shape, r17)") {
    // round-16 VERDICT #4: the last LLM-dedup family member without an
    // ingest-time form. Docs arrive over two triggers (all four band rows
    // of a doc together — the unit of ingest); each (band, sig) bucket
    // probes its state, and a multi-band pair is emitted only by its
    // smallest colliding band, so the appended union must equal the batch
    // pair set EXACTLY — including pairs whose two docs arrived in
    // different triggers.
    import spark.implicits._
    import graft.streaming.StatefulOps
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkTestSession.sfDir
    val rows = StatefulOps.minhashBandRows(
      Tables.documents(spark, dir)).collect().toSeq
    // interleaved split (even/odd doc_id): planted near-dup pairs sit on
    // consecutive ids, so cross-trigger pairs are guaranteed non-vacuous
    val (b1, b2) = rows.partition(_.doc_id % 2 == 0)
    val stream = MemoryStream[StatefulOps.BandHv]
    val q = StatefulOps.minhashStreamQuery(stream.toDS(), "minhash_par_t")
    def verified() = StatefulOps.minhashVerify(spark.table("minhash_par_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (t1, fin) =
      try {
        stream.addData(b1: _*)
        q.processAllAvailable()
        val t1 = verified()
        stream.addData(b2: _*)
        q.processAllAvailable()
        (t1, verified())
      } finally q.stop()
    val batch = graft.operators.TextOps.dedupMinhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "no near-dup pairs in the fixture — parity vacuous")
    assert((fin diff t1).nonEmpty,
      "no pair emitted by the second trigger — cross-trigger path vacuous")
    assert(fin == batch, s"stream pairs drifted: extra=${(fin diff batch).take(5)} " +
      s"missing=${(batch diff fin).take(5)}")
  }

  test("file-source STATEFUL streaming: minhash bucket fold over a growing " +
       "parquet dir == the registered batch entry (K2 ingest shape, r17)") {
    // the production ingest entry point — readStream parquet DIRECTORY
    // DISCOVERY with a second file landing mid-stream (the topn/matview/kmv
    // file-source discipline), for the round-17 minhash dedup twin
    import spark.implicits._
    import graft.streaming.StatefulOps
    val dir = SparkTestSession.sfDir
    val src = "/tmp/graft_test_minhash_stream_src"
    val rows = StatefulOps.minhashBandRows(
      Tables.documents(spark, dir)).collect().toSeq
    val (b1, b2) = rows.partition(_.doc_id % 2 == 0)
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val schema = b1.toDS().toDF().schema
    b1.toDS().toDF().write.parquet(src)
    val q = StatefulOps.minhashStreamQuery(
      spark.readStream.schema(schema).parquet(src).as[StatefulOps.BandHv],
      "minhash_fsrc_t")
    def verified() = StatefulOps.minhashVerify(spark.table("minhash_fsrc_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (t1, fin) =
      try {
        q.processAllAvailable()
        val t1 = verified()
        b2.toDS().toDF().write.mode("append").parquet(src)
        q.processAllAvailable()
        (t1, verified())
      } finally q.stop()
    val batch = StatefulOps.streamDedupMinhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "no near-dup pairs in the fixture — parity vacuous")
    assert((fin diff t1).nonEmpty,
      "no pair emitted after the second file — ingest path vacuous")
    assert(fin == batch, s"file-stream pairs drifted: extra=${(fin diff batch).take(5)} " +
      s"missing=${(batch diff fin).take(5)}")
  }

  /** Multiset difference of sink snapshots — the order-free way to isolate
    * one trigger's Update-mode emissions (round-11 ADVICE: the memory sink
    * does not contractually guarantee collect order, so "last rows" is not
    * a safe final-state read; snapshot-before minus snapshot-after is).
    */
  private def emittedAfter[T](before: Seq[T], after: Seq[T]): Seq[T] = {
    val pool = scala.collection.mutable.Map.empty[T, Int]
    before.foreach(r => pool.update(r, pool.getOrElse(r, 0) + 1))
    after.filter { r =>
      val n = pool.getOrElse(r, 0)
      if (n > 0) { pool.update(r, n - 1); false } else true
    }
  }

  test("file-source STATEFUL streaming: transformWithState top-N (RocksDB " +
       "store) over a growing parquet dir == the registered batch entry " +
       "(J7 ingest shape, r16)") {
    // round-15 VERDICT #4: stream_topn_state proved parity via MemoryStream
    // only; this drives the TransformWithState/ListState path through the
    // production ingest entry point — readStream parquet DIRECTORY
    // DISCOVERY with a second file landing mid-stream — and requires each
    // user's FINAL ranking to equal the registered batch form.
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.TopEvent
    val dir = SparkTestSession.sfDir
    val src = "/tmp/graft_test_topn_stream_src"
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[TopEvent].collect().toSeq
    val (b1, b2) = evs.splitAt(evs.length / 2)
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val schema = b1.toDF().schema
    b1.toDF().write.parquet(src)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def snap() = spark.table("topn_fsrc_t").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val q = StatefulOps.topnStreamQuery(
      spark.readStream.schema(schema).parquet(src).as[TopEvent], "topn_fsrc_t")
    val (t1, t2) =
      try {
        q.processAllAvailable()
        val t1 = snap()
        b2.toDF().write.mode("append").parquet(src)
        q.processAllAvailable()
        (t1, snap())
      } finally {
        q.stop()
        prev match {
          case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    // final ranking per user: trigger-2's emission when the user re-emitted
    // (Update mode re-emits the whole refreshed ranking), else trigger-1's
    val late = emittedAfter(t1, t2).groupBy(_._1)
    val fin = (t1.groupBy(_._1) ++ late).values.flatten.toSet
    val batch = StatefulOps.streamTopnState(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(late.nonEmpty, "no ranking refreshed by the second file — parity vacuous")
    assert(fin == batch, s"file-stream top-N drifted: ${(fin diff batch).take(5)} / " +
      s"${(batch diff fin).take(5)}")
  }

  test("file-source STATEFUL streaming: mapGroupsWithState matview over a " +
       "growing parquet dir == the registered batch entry (J16 ingest shape, r16)") {
    import spark.implicits._
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.MvDelta
    val dir = SparkTestSession.sfDir
    val src = "/tmp/graft_test_mv_stream_src"
    val deltas = StatefulOps.mvDeltas(spark, dir).collect().toSeq
    val (b1, b2) = deltas.splitAt(deltas.length / 2)
    new scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    val schema = b1.toDF().schema
    b1.toDF().write.parquet(src)
    def snap() = spark.table("mv_fsrc_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val q = StatefulOps.matviewStreamQuery(
      spark.readStream.schema(schema).parquet(src).as[MvDelta], "mv_fsrc_t")
    val (t1, t2) =
      try {
        q.processAllAvailable()
        val t1 = snap()
        b2.toDF().write.mode("append").parquet(src)
        q.processAllAvailable()
        (t1, snap())
      } finally q.stop()
    val late = emittedAfter(t1, t2).groupBy(_._1)
    val fin = (t1.groupBy(_._1) ++ late).values.flatten
      .map(r => (r._1, r._2, r._3)).toSet
    val batch = StatefulOps.streamMatview(spark, dir).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
    assert(late.nonEmpty, "no group updated by the second file — parity vacuous")
    assert(fin == batch, s"file-stream matview drifted: ${(fin diff batch).take(5)} / " +
      s"${(batch diff fin).take(5)}")
  }

  test("withWatermark drops data later than the watermark delay (J4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String, Double)]
    val agg = stream.toDF.toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_t").outputMode("append").start()
    try {
      // batch 1: two events in the 10:00 window, then one far ahead that
      // advances the watermark beyond 10:00+1h+10m and closes the window.
      stream.addData((ts("2024-01-01 10:05:00"), "click", 1.0))
      stream.addData((ts("2024-01-01 10:20:00"), "click", 1.0))
      q.processAllAvailable()
      stream.addData((ts("2024-01-01 13:00:00"), "click", 1.0))
      q.processAllAvailable()
      // batch 2: a late event for the already-closed 10:00 window — dropped.
      stream.addData((ts("2024-01-01 10:30:00"), "late", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val closed = spark.table("wm_t").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    // the 10:00 window emitted with the 2 on-time events only
    assert(closed(ts("2024-01-01 10:00:00")) == 2L)
  }

  test("stream_watermark batch replay == MemoryStream withWatermark drops (J4)") {
    import graft.operators.EventOps
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the registered query's arrival model, in miniature: micro-batch =
    // event_id div 1000, 'error' rows delivered one batch late. Chosen so
    // every drop mode is hit: a clearly-late error (02:00-end window vs
    // 06:30 watermark), a window-end save (ts 06:10 < wm 06:30 but window
    // end 07:00 > wm — the predicate is on the WINDOW, not the row), and a
    // second-round drop after the watermark advanced.
    val batch0 = Seq((0L, ts("2024-01-01 00:30:00"), "click", 1.0),
                     (1L, ts("2024-01-01 03:15:00"), "view",  2.0),
                     (2L, ts("2024-01-01 08:20:00"), "click", 3.0),
                     (3L, ts("2024-01-01 12:30:00"), "view",  4.0))
    val lateErr0 = Seq((10L, ts("2024-01-01 01:10:00"), "error", 5.0),  // dropped
                       (11L, ts("2024-01-01 06:10:00"), "error", 6.0),  // kept (window end)
                       (12L, ts("2024-01-01 05:40:00"), "error", 7.0))  // dropped
    val batch1 = Seq((1000L, ts("2024-01-01 13:00:00"), "click", 8.0),
                     (1001L, ts("2024-01-01 18:00:00"), "view",  9.0))
    val lateErr1 = Seq((1500L, ts("2024-01-01 10:30:00"), "error", 10.0), // dropped
                       (1501L, ts("2024-01-01 12:40:00"), "error", 11.0)) // kept
    val batch2 = Seq((2000L, ts("2024-01-01 19:00:00"), "purchase", 12.0))
    // sentinel: closes every real window in append mode; its own window
    // never closes, and the batch side excludes it symmetrically below
    val flush = Seq((3000L, ts("2024-02-01 00:00:00"), "flush", 0.0))

    val dir = "/tmp/graft_test_stream_watermark"
    (batch0 ++ lateErr0 ++ batch1 ++ lateErr1 ++ batch2 ++ flush)
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = EventOps.streamWatermark(spark, dir)
      .filter(col("window_start") < lit(ts("2024-02-01 00:00:00")))
      .select("window_start", "event_type", "n", "sum_value")
      .collect().toSeq.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1.getTime, t._2))

    // exact drop set first — pins the fixture, not just the equality
    val errVals = batch.filter(_._2 == "error").map(_._4).sorted
    assert(errVals == Seq(6.0, 11.0), s"late-drop set wrong: $errVals")

    val stream = MemoryStream[(Timestamp, String, Double)]
    val agg = stream.toDF.toDF("ts", "event_type", "value")
      .withWatermark("ts", "6 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Num.money(sum(graft.functions.Num.dec2(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName("wm_replay_t")
      .outputMode("append").start()
    try {
      for (b <- Seq(batch0, lateErr0 ++ batch1, lateErr1 ++ batch2, flush)) {
        stream.addData(b.map(r => (r._2, r._3, r._4)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("wm_replay_t")
      .collect().toSeq.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1.getTime, t._2))

    assert(streamed == batch,
      s"batch watermark replay diverges from Structured Streaming:\n  stream=$streamed\n  batch=$batch")
    assert(batch.nonEmpty)
  }

  test("dedup_ttl streaming twin: bounded state expires and re-keeps, verdicts == batch islands (J15)") {
    import spark.implicits._
    import graft.streaming.StatefulOps.KeyedEvent
    implicit val sqlCtx = spark.sqlContext
    // u1/click: keeper, dup inside TTL, then a >24h-silent keeper with its
    // own dup — the second keeper only happens if streaming state EXPIRED
    // (EventTimeTimeout), the bounded-state property under test.
    // u2/view: single event (trivially kept). u1/view: same user, other
    // type — keys are (user, type), so it dedups independently.
    val day1 = Seq(
      KeyedEvent(1L, "click", 10L, ts("2024-01-01 10:00:00")),
      KeyedEvent(1L, "click", 11L, ts("2024-01-01 11:00:00")),
      KeyedEvent(1L, "view", 12L, ts("2024-01-01 11:30:00")),
      KeyedEvent(2L, "view", 20L, ts("2024-01-01 12:00:00")))
    val day3 = Seq(
      KeyedEvent(1L, "click", 30L, ts("2024-01-03 09:00:00")),
      KeyedEvent(1L, "click", 31L, ts("2024-01-03 09:30:00")))
    val all = day1 ++ day3

    // batch islands truth (same TTL constant, same fold core)
    val want = all.groupBy(e => (e.user_id, e.event_type)).flatMap { case (k, es) =>
      graft.streaming.StatefulOps.foldTtl(k, es, None)._1
    }.map(v => v.event_id -> v.kept).toMap

    val stream = MemoryStream[KeyedEvent]
    val q = graft.streaming.StatefulOps.dedupTtlStreamQuery(stream.toDS(), "ttl_parity_t")
    try {
      for (b <- Seq(day1, day3)) { stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("ttl_parity_t")
      .select("event_id", "kept").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    assert(got.keySet == want.keySet, s"missing verdicts: got=$got want=$want")
    assert(got == want, s"stream verdicts diverge: got=$got want=$want")
    // the scenario really exercised both branches and the expiry re-keep
    assert(want(10L) == 1 && want(11L) == 0, "day-1 keeper/dup shape broken")
    assert(want(30L) == 1, "post-expiry event was not re-kept — state never expired in batch truth")
    assert(want(31L) == 0)
  }
}
