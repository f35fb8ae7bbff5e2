package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Static kernel shared by interpreted eval and generated code. */
object DotI8 {
  /** Signed-byte dot product, exact: products are at most 127² and
    * the sum fits a long for any realistic dimension; the final
    * widening to double is exact below 2^53 (127²·dim < 2^53 for any
    * dim < 5.5e11). Bit-identical to summing the same int values
    * through [[DotF32]]-style in-order double accumulation, so the
    * quantized-index probe ranks EXACTLY like the in-memory
    * `array<int>` flavor.
    */
  def dot(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    val n = a.length
    while (i < n) {
      s += a(i).toLong * b(i).toLong
      i += 1
    }
    s.toDouble
  }
}

/** Dot product of two int8-packed `binary` vectors (the
  * [[QuantizeInt8BytesExpr]] layout) in exact integer arithmetic —
  * the probe kernel of the quantized persistent IVF index. A length
  * mismatch returns NULL (same contract as [[DotF32Expr]]: dimension
  * bugs surface as visible nulls, never plausible wrong scores).
  *
  * Registered as SQL function `dot_i8` via [[graft.GraftExtensions]].
  */
case class DotI8Expr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_i8 requires (binary, binary), got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_i8"
  // nullable even over non-null children: length mismatch → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) null else DotI8.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotI8.dot($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
