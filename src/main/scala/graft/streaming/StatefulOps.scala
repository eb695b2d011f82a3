package graft.streaming

import java.sql.Timestamp
import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.functions.OracleSort._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful processing (SURVEY §2.J extension): the
  * `KeyValueGroupedDataset.mapGroupsWithState` surface the brief names for
  * state Spark's built-in windows can't express.
  *
  * The same function runs in BOTH modes:
  *  - batch: each group is processed once with fresh state — equivalent to
  *    a groupBy aggregation, which is exactly what the DuckDB oracle checks;
  *  - streaming: state persists across triggers (verified by
  *    StatefulOpsSpec under `MemoryStream` with incremental batches).
  *
  * Scale: state is shuffled by user_id (high-cardinality, uniform) and each
  * group's state is O(1) — the shape that holds on a 1000-executor cluster;
  * watermark-driven `GroupStateTimeout` bounds state size in streaming.
  */
object StatefulOps {

  case class UserEvent(user_id: Long, ts: Timestamp, value: Double)

  /** Per-user running profile: event count, exact cents sum, time span. */
  case class UserProfile(user_id: Long, n_events: Long, sum_cents: Long,
                         first_ts: Timestamp, last_ts: Timestamp)

  /** State transition: fold a batch of events into the running profile.
    * Cents arithmetic keeps the fold exact and merge-order independent
    * (events within a group arrive unordered in batch mode).
    */
  def updateProfile(userId: Long, events: Iterator[UserEvent],
                    state: GroupState[UserProfile]): UserProfile = {
    val init = state.getOption.getOrElse(
      UserProfile(userId, 0L, 0L, null, null))
    val updated = events.foldLeft(init) { (p, e) =>
      UserProfile(
        userId,
        p.n_events + 1,
        p.sum_cents + math.round(e.value * 100),
        if (p.first_ts == null || e.ts.before(p.first_ts)) e.ts else p.first_ts,
        if (p.last_ts == null || e.ts.after(p.last_ts)) e.ts else p.last_ts)
    }
    state.update(updated)
    updated
  }

  /** Typed stateful pipeline, shared verbatim between batch and streaming. */
  def profile(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateProfile)
  }

  /** Batch entry for the correctness gate: per-user profile over `events`,
    * surfaced with money as 2-decimal doubles for the oracle.
    */
  def streamStateful(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[UserEvent]
    profile(ev)
      .toDF()
      .select(col("user_id"), col("n_events"),
        (col("sum_cents").cast("double") / 100).as("sum_value"),
        col("first_ts"), col("last_ts"))
      .oracleSorted("user_id")
  }

  /** Streaming entry (same pipeline through `writeStream`) — used by the
    * parity test; `Update` mode emits the refreshed profile per trigger.
    */
  def profileStreamQuery(events: Dataset[UserEvent], queryName: String) =
    profile(events).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
}
