package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F9 `token_set_ratio` as a native Catalyst expression (SURVEY §4
  * names the fuzzy ratios as the one custom-expression slot; reference:
  * src/components/preprocessing/table_curator.py:169-191).
  *
  * Versus the Scala UDF in [[Fuzzy]]: participates in whole-stage
  * codegen (the generated code calls the static scorer directly — no
  * row encoding, no closure serialization, no null-boxing per row).
  * Registered as SQL function `token_set_ratio` via
  * [[graft.GraftExtensions]].
  */
case class TokenSetRatioExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; inference gives Seq[DataType] <: Seq[AbstractDataType]
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType                = IntegerType
  override def prettyName: String                = "token_set_ratio"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Fuzzy.tokenSetRatio(a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Scala objects emit static forwarders: callable from generated Java.
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Fuzzy.tokenSetRatio($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
