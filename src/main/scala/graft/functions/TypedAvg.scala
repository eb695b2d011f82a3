package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed average as a custom `Aggregator[IN, BUF, OUT]`.
  *
  * The reference's typed path used `org.apache.spark.sql.expressions.scalalang
  * .typed.avg` [ref: timeusage/…/TimeUsage.scala#timeUsageGroupedTyped], which
  * was removed in Spark 3. This is the idiomatic replacement: a (sum, count)
  * buffer with an associative+commutative `merge`, so Spark runs it with full
  * partial aggregation (map-side combine) — shuffle volume at 100 TB is one
  * 16-byte buffer per group per task, not one row per input.
  */
class TypedAvg[IN](f: IN => Double) extends Aggregator[IN, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: IN): (Double, Long) = (b._1 + f(a), b._2 + 1)
  override def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object TypedAvg {
  /** Average of the second element of a (key, value) pair Dataset. */
  def ofSecond: TypedColumn[(String, Double), Double] =
    new TypedAvg[(String, Double)](_._2).toColumn
}
