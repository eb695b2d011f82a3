package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed average as a custom `Aggregator[IN, BUF, OUT]`.
  *
  * The reference's typed path used `org.apache.spark.sql.expressions.scalalang
  * .typed.avg` [ref: timeusage/…/TimeUsage.scala#timeUsageGroupedTyped], which
  * was removed in Spark 3. This is the idiomatic replacement, with one twist:
  * the buffer is **(cents: Long, count: Long)** rather than (Double, Long).
  * The inputs are 2-decimal money, so `round(v * 100)` is exact, the Long sum
  * is associative, and the result is independent of partition count and merge
  * order — identical on local[32] and a 1000-executor cluster, and identical
  * to the DuckDB oracle's `sum(CAST(v AS DECIMAL(12,2)))/count` form. A plain
  * double-sum buffer would be merge-order-dependent in the last ulp and could
  * flip a round-2 boundary nondeterministically.
  *
  * `merge` is associative+commutative, so Spark runs full partial aggregation
  * (map-side combine): shuffle volume is one 16-byte buffer per group per
  * task, not one row per input.
  */
class TypedAvg[IN](f: IN => Double) extends Aggregator[IN, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: IN): (Long, Long) =
    (b._1 + math.round(f(a) * 100), b._2 + 1)
  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0) Double.NaN else (b._1 / 100.0) / b._2
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object TypedAvg {
  /** Average of the second element of a (key, value) pair Dataset. */
  def ofSecond: TypedColumn[(String, Double), Double] =
    new TypedAvg[(String, Double)](_._2).toColumn

  /** Plain Double-input instance, for `udaf(...)` SQL registration. */
  def ofDouble: TypedAvg[Double] = new TypedAvg[Double](identity)
}
