package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import graft.functions.OracleSort._
import org.apache.spark.sql.functions._

/** Event-time / streaming-shaped operators (SURVEY §2.J).
  *
  * The reference has no streaming; these run the standard event-time surface
  * in batch with the SAME functions Structured Streaming executes (`window`,
  * `session_window`), so the semantics transfer 1:1 to a `readStream` source.
  * StreamingParitySpec re-runs the tumbling aggregation under `MemoryStream`
  * to prove batch/stream parity.
  *
  * Scale notes: time-windowed aggregation shuffles by (window, key) — group
  * cardinality is bounded by time-range/window-size × key cardinality, so
  * these hold at 100 TB. Session windows shuffle by user_id; per-user event
  * counts are the skew risk, handled by AQE skew-join/partition splitting.
  */
object EventOps {

  /** J1: tumbling window aggregation. */
  def streamTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.functions.Num.money(sum(graft.functions.Num.dec2(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      .oracleSorted("window_start", "event_type")

  /** J2: sliding window (1 hour window, 15 minute slide → 4 windows/row). */
  def streamSliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), graft.functions.Num.money(sum(graft.functions.Num.dec2(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n"), col("sum_value"))
      .oracleSorted("window_start")

  /** J3: session window per user (10 minute gap). Session start is the first
    * event's timestamp; a new session begins when the gap from the previous
    * event is >= the gap duration (Spark merges overlapping [ts, ts+gap)).
    */
  def streamSession(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), graft.functions.Num.money(sum(graft.functions.Num.dec2(col("value")))).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
              col("n_events"), col("sum_value"))
      .oracleSorted("user_id", "session_start")

  /** J8 `stream_join`: attribution join — each purchase enriched with the
    * count of the same user's clicks in the preceding 10 minutes. This is
    * the STREAM-STREAM time-range join (the enrichment every attribution
    * pipeline runs at ingest): in Structured Streaming the identical
    * predicate (user equality + bounded time range) with watermarks on
    * both sides runs incrementally with bounded state — the range bound is
    * what lets the engine expire buffered rows. StreamingParitySpec runs
    * exactly that MemoryStream join and asserts it matches this batch form.
    *
    * Batch scale shape: same bin-bucket trick as `join_range` — clicks land
    * in 10-minute bins, each purchase probes its own and the previous bin,
    * so the join is a plain (user, bin) equi-join with the exact range
    * predicate as a post-filter; work ∝ matches, never |events|². Left join
    * keeps zero-click purchases at count 0.
    */
  def streamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bin = expr("unix_micros(ts) div 600000000") // 600 s = the range width
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        explode(array(bin - 1, bin)).as("bin"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"), bin.as("c_bin"))
    purchases.join(clicks,
        col("user_id") === col("c_user") && col("bin") === col("c_bin") &&
        col("c_ts") >= col("ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") < col("ts"), "left")
      .groupBy("event_id", "user_id", "ts")
      .agg(count(col("c_id")).as("n_clicks_10m"))
      .oracleSorted("event_id")
  }

  /** J5: keep-first dedup by (user_id, event_type) — the batch equivalent of
    * streaming `dropDuplicates` with arrival order made deterministic
    * (earliest ts, then event_id).
    */
  def dedupState(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "event_type").orderBy(asc("ts"), asc("event_id"))))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .oracleSorted("user_id", "event_type")
}
