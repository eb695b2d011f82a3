package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native squared euclidean distance over dense numeric-array columns, with
  * codegen — the k-means / IVF assignment kernel (see FloatVecDot for why a
  * custom `Expression` is justified on these hot paths: HOFs are
  * `CodegenFallback`, and the argmin evaluates this once per row PER
  * CENTROID).
  *
  * Accepts `array<float>` and `array<double>` on either side independently:
  * the corpus side is float32 embeddings while centroid arrays (collected
  * means, literal centers) are float64 — the HOF form relied on implicit
  * lambda-argument coercion for the same mix.
  *
  * Semantics are IDENTICAL to `Vec.sqDist`'s HOF fold: per element, widen
  * exactly to float64, square the difference, accumulate strictly
  * left-to-right — bitwise-equal results (asserted in NativeVecSpec), so
  * swapping it into an oracle-checked plan changes nothing but speed.
  */
case class VecSqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sq_dist"

  private def get(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left.dataType).get
    val rt = elemType(right.dataType).get
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val diff = get(x, lt, i) - get(y, rt, i)
      acc += diff * diff
      i += 1
    }
    acc
  }

  private def genGet(arr: String, dt: DataType, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val lt = elemType(left.dataType).get
      val rt = elemType(right.dataType).get
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $diff = ${genGet(a, lt, i)} - ${genGet(b, rt, i)};
         |  $acc += $diff * $diff;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecSqDist {
  /** Column-level entry point: codegen'd Σ (xᵢ−yᵢ)². */
  def sqDist(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecSqDist(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
