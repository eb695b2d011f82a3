package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd probe of a pre-built bloom sketch over a long key column.
  *
  * Catalyst already injects runtime bloom filters INSIDE a single query
  * (`spark.sql.optimizer.runtime.bloomFilter.*`, proven in
  * RuntimeFilterSpec); this expression is the complementary EXPLICIT form a
  * 100 TB pipeline needs when the sketch outlives one query: build the
  * filter once from a selective dimension (a distributed
  * `df.stat.bloomFilter` tree-aggregate — never a row collect), then apply
  * it to any number of fact scans, dropping non-joining rows BEFORE their
  * shuffles. The sketch rides the serialized plan to executors (a bloom
  * bitset is KB–MB — sketch-sized, not data-sized).
  *
  * Guarantee: no false negatives (every inserted key probes true), so a
  * downstream equi-join on the same key removes the false positives and the
  * end-to-end result is EXACT — which is why `join_bloom` can be oracled by
  * a plain SQL join with no bloom in sight.
  *
  * Codegen calls `BloomFilter.mightContainLong` directly on a
  * `ctx.addReferenceObj` handle, so the probe stays inside WholeStageCodegen
  * (no UDF serialization, no interpreted fallback; asserted in BloomSpec).
  */
case class BloomProbe(child: Expression, sketch: BloomFilter)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key column, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    sketch.mightContainLong(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other => other.asInstanceOf[Long]
    })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomSketch", sketch, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long) $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  /** Column-level entry point: `true` iff the key might be in the sketch. */
  def probe(key: Column, sketch: BloomFilter): Column =
    GraftSqlBridge.column(BloomProbe(GraftSqlBridge.expression(key), sketch))
}
