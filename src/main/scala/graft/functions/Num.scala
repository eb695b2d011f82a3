package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-decimal money arithmetic.
  *
  * Doubles are fine for storage, but `round(double, 2)` is engine-defined at
  * the `.xx5` boundary (Spark rounds the shortest decimal repr HALF_UP;
  * DuckDB rounds the binary value), and products of 2-decimal money columns
  * land on that boundary constantly. Computing in DecimalType keeps the
  * arithmetic mathematically exact, makes HALF_UP rounding well-defined, and
  * — as a scale bonus — makes aggregate results independent of partition
  * count and merge order (decimal sums are associative; float sums are not),
  * so results are identical on local[32] and a 1000-executor cluster.
  */
object Num {
  /** Money column (2-decimal) as exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Rate column (discount/tax, 2-decimal, < 10) as exact decimal. */
  def rate2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact net price: price * (1 - discount) — 4-decimal. */
  def discounted(price: Column, disc: Column): Column =
    dec2(price) * (lit(1.0).cast(DecimalType(4, 2)) - rate2(disc))

  /** Exact charged price: price * (1 - discount) * (1 + tax) — 6-decimal. */
  def charged(price: Column, disc: Column, tax: Column): Column =
    discounted(price, disc) * (lit(1.0).cast(DecimalType(4, 2)) + rate2(tax))

  /** Round an exact decimal to 2 places and surface as double. */
  def money(c: Column): Column = round(c, 2).cast("double")
}
