package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<float>` columns, with codegen.
  *
  * Why a custom `Expression` is justified here (and nowhere else in this
  * engine): Spark's higher-order functions (`zip_with`, `aggregate`) are
  * `CodegenFallback` — an HOF in a projection punches a hole in whole-stage
  * codegen and evaluates interpreted, per row, with a closure allocation per
  * element. For the similarity-search hot path (billions of corpus rows ×
  * 64-dim vectors at 100 TB) that interpretation overhead dominates. This
  * expression generates a tight primitive loop instead and keeps the stage
  * inside WholeStageCodegen (asserted in NativeVecSpec).
  *
  * Semantics are IDENTICAL to the HOF form used elsewhere: strict
  * left-to-right float64 accumulation of exactly-widened float32 products —
  * so results remain bitwise-equal to the DuckDB oracle (see Vec). Vectors
  * are assumed dense (no null elements), the embedding-column contract.
  */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column-level entry point: codegen'd Σ xᵢ·yᵢ for float vectors. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      FloatVecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
