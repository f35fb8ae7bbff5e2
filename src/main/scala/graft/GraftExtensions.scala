package graft

import graft.functions.{DotF32Expr, TokenSetRatioExpr}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions: registers the custom Catalyst expressions as SQL
  * functions. Activated by `GraftSession.local` (and usable on any
  * cluster via `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("token_set_ratio"),
      new ExpressionInfo(classOf[TokenSetRatioExpr].getName, "token_set_ratio"),
      (children: Seq[Expression]) => TokenSetRatioExpr(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32Expr].getName, "dot_f32"),
      (children: Seq[Expression]) => DotF32Expr(children(0), children(1))
    ))
  }
}
