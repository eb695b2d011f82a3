package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

/** Terminal total-order sorts exist ONLY for the oracle's hash-determinism
  * contract: the driver compares each query's materialized rows bitwise
  * against DuckDB, so output order must be a deterministic total order.
  * Operator SEMANTICS never depend on it — every rank / bucket / id the
  * order could convey is already an explicit column.
  *
  * At 100 TB the terminal range-partition sort would dominate otherwise
  * cheap full-table projections, so production callers elide it plan-wide
  * with the session conf `graft.terminalSort=false` (default `true` keeps
  * the oracle contract). PlanShapeSpec asserts the elided plan contains no
  * terminal Sort node and the default plan is unchanged.
  */
object OracleSort {
  private def enabled(df: DataFrame): Boolean =
    df.sparkSession.conf.get("graft.terminalSort", "true") != "false"

  implicit class TerminalSortOps(private val df: DataFrame) extends AnyVal {
    def oracleSorted(cols: Column*): DataFrame =
      if (OracleSort.enabled(df)) df.orderBy(cols: _*) else df
    def oracleSorted(col: String, cols: String*): DataFrame =
      if (OracleSort.enabled(df)) df.orderBy(col, cols: _*) else df
  }
}
