package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** In-order dot product of two numeric array columns (`array<float>`
  * or `array<double>`, independently per side) in double precision, as
  * a native Catalyst expression.
  *
  * The `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation this
  * replaces is codegen'd too, but it materializes the zipped product
  * array per row-pair and walks it through two higher-order-function
  * eval loops with per-element null boxing. This expression is the
  * loop a hand-written kernel would be: one fused pass over the two
  * `ArrayData`, no intermediate allocation — the hot inner op of the
  * whole ANN/embedding family (`Similarity`, `Dedup.embedding*`,
  * including the refined-IVF path whose centroids are
  * `array<double>`).
  *
  * Numeric contract (what keeps the DuckDB oracles unchanged): each
  * element is widened to double and products are accumulated IN ARRAY
  * ORDER — bit-identical to both the HOF formulation and the oracle's
  * sequential `list_sum(list_transform(list_zip(...)))`.
  *
  * Inputs are expected to be equal-length arrays with non-null
  * elements (embedding vectors); a length mismatch returns NULL —
  * same as the `aggregate(zip_with(...))` formulation (zip_with pads
  * the shorter side with nulls and null propagates through the fold),
  * so a dimension-mismatch bug upstream surfaces as a visible null,
  * never a plausible wrong score.
  *
  * Registered as SQL function `dot_f32` via [[graft.GraftExtensions]].
  */
case class DotF32Expr(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)   => Some(FloatType)
    case ArrayType(DoubleType, _)  => Some(DoubleType)
    case ArrayType(IntegerType, _) => Some(IntegerType)
    case _                         => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_f32 requires array<float>/array<double>/array<int> inputs, got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"
  // nullable even over non-null children: length mismatch → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x  = a.asInstanceOf[ArrayData]
    val y  = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val xf = elemType(left.dataType).contains(FloatType)
    val yf = elemType(right.dataType).contains(FloatType)
    val n  = x.numElements()
    var s  = 0.0
    var i  = 0
    val xi = elemType(left.dataType).contains(IntegerType)
    val yi = elemType(right.dataType).contains(IntegerType)
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else if (xi) x.getInt(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else if (yi) y.getInt(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      def acc(arr: String, side: Expression, idx: String): String = elemType(side.dataType) match {
        case Some(FloatType)   => s"(double) $arr.getFloat($idx)"
        case Some(IntegerType) => s"(double) $arr.getInt($idx)"
        case _                 => s"$arr.getDouble($idx)"
      }
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${acc(a, left, i)} * ${acc(b, right, i)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
