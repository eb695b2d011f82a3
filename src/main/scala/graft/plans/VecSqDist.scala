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
  * Semantics are IDENTICAL to `Vec.sqDist`'s HOF fold, INCLUDING the
  * malformed-input edges (round-2 ADVICE): per element, widen exactly to
  * float64, square the difference, accumulate strictly left-to-right;
  * mismatched lengths yield NULL (zip_with pads the short side with null →
  * the fold is null), and a null element yields NULL — never a plausible
  * partial sum. Bitwise-equal results asserted in NativeVecSpec, so
  * swapping it into an oracle-checked plan changes nothing but speed. The
  * per-element null checks are only generated when the array type says
  * `containsNull`, so dense literal centers stay check-free.
  */
case class VecSqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  /** Null can arise from non-null inputs (length mismatch, null element). */
  override def nullable: Boolean = true

  private def elemNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, n) => n
    case _               => false
  }

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
    if (x.numElements() != y.numElements()) return null
    val lt = elemType(left.dataType).get
    val rt = elemType(right.dataType).get
    val checkL = elemNullable(left.dataType)
    val checkR = elemNullable(right.dataType)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((checkL && x.isNullAt(i)) || (checkR && y.isNullAt(i))) return null
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
      val bad = ctx.freshName("bad")
      val diff = ctx.freshName("diff")
      val lt = elemType(left.dataType).get
      val rt = elemType(right.dataType).get
      val nullChecks = Seq(
        if (elemNullable(left.dataType)) Some(s"$a.isNullAt($i)") else None,
        if (elemNullable(right.dataType)) Some(s"$b.isNullAt($i)") else None,
      ).flatten
      val elemGuard =
        if (nullChecks.isEmpty) ""
        else s"if (${nullChecks.mkString(" || ")}) { $bad = true; break; }"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemGuard
         |    final double $diff = ${genGet(a, lt, i)} - ${genGet(b, rt, i)};
         |    $acc += $diff * $diff;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
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
