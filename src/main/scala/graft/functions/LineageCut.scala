package graft.functions

import org.apache.spark.sql.DataFrame

/** Conf-selectable lineage-cut strategy for the engine's materialization
  * points (round-4 VERDICT "Next round" #7; round-3 ADVICE #4 documented the
  * trade-off, this makes it operable without code changes).
  *
  * Every multi-consumer intermediate in the engine (hashed-shingle tables,
  * component-label iterations, the global-row-number pin) cuts lineage
  * through here; `graft.lineageCut` selects HOW:
  *
  *  - `localCheckpoint` (DEFAULT — behavior unchanged from round 4): blocks
  *    live in the executor block manager, freed by the ContextCleaner once
  *    the result frame is garbage. Lineage is discarded, so a lost executor
  *    fails the job (retried from source) instead of recomputing — the right
  *    local / driver-contract trade-off.
  *  - `checkpoint`: RELIABLE checkpoint against the SparkContext checkpoint
  *    dir (set it to durable storage on a cluster; if unset, a JVM-local
  *    tmp dir is installed so the mode works out of the box). Survives
  *    executor loss and dynamic allocation — the cluster deployment mode.
  *  - `cache`: persist WITHOUT cutting lineage — blocks are recomputable
  *    (executor loss is transparent) but plans grow through iterations and
  *    the InMemoryRelation outlives the call until the cleaner drops the
  *    frame. Supported for completeness; NOT honored at pinned sites (below).
  *
  * Pinned sites (`pinned = true`): `withGlobalRowNumber` materializes a
  * `repartitionByRange` whose sampled boundaries differ per execution — a
  * cache block silently dropped under memory pressure would RECOMPUTE with
  * different partition contents than the driver's offsets were computed
  * from, corrupting row numbers. `cache` therefore falls back to
  * `localCheckpoint` there; both checkpoint modes pin correctly.
  */
object LineageCut {
  val ConfKey = "graft.lineageCut"
  val Modes: Set[String] = Set("localCheckpoint", "checkpoint", "cache")

  implicit class LineageCutOps(private val df: DataFrame) extends AnyVal {
    /** Cut (or pin) this frame per `graft.lineageCut`. `eager = false`
      * defers materialization into the first consuming job; `eager = true`
      * runs a job now (iteration loops use it to keep plans flat and read
      * convergence checks from materialized rows).
      */
    def lineageCut(eager: Boolean = true, pinned: Boolean = false): DataFrame = {
      val s = df.sparkSession
      val mode = s.conf.get(ConfKey, "localCheckpoint")
      require(Modes.contains(mode),
        s"$ConfKey must be one of ${Modes.mkString("|")}, got '$mode'")
      mode match {
        case "cache" if !pinned =>
          val c = df.persist()
          if (eager) c.count()
          c
        case "cache" /* pinned */ => df.localCheckpoint(eager)
        case "checkpoint" =>
          if (s.sparkContext.getCheckpointDir.isEmpty)
            s.sparkContext.setCheckpointDir(
              s"${System.getProperty("java.io.tmpdir")}/graft_checkpoints")
          df.checkpoint(eager)
        case _ => df.localCheckpoint(eager)
      }
    }
  }
}
