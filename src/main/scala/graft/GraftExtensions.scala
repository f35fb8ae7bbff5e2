package graft

import graft.functions.{DotF32Expr, DotI8Expr, FreqTopKAgg, KmvDistinctAgg, KmvQuantileAgg, KmvQuantileMergeAgg, KmvQuantileSketchAgg, KmvSketchAgg, LevAtMostExpr, Md5FeatureCountsExpr, MinhashMd5SigsExpr, MinhashSigsExpr, NfcNormalizeExpr, QuantizeInt8BytesExpr, QuantizeInt8Expr, Simhash32Md5Expr, Simhash64Expr, TokenSetRatioExpr}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions: registers the custom Catalyst expressions as SQL
  * functions. Activated by `GraftSession.local` (and usable on any
  * cluster via `spark.sql.extensions=graft.GraftExtensions`).
  */
object GraftExtensions {
  /** Builder-time sketch-size argument: must be a foldable integer
    * literal (the sketch size shapes the aggregation buffer, so it
    * cannot vary per row). Fails analysis with a named error instead
    * of an opaque eval NPE/ClassCastException.
    */
  private[graft] def literalK(fn: String, children: Seq[Expression], pos: Int): Int = {
    require(children.length > pos, s"$fn requires a size argument at position ${pos + 1}")
    val e = children(pos)
    require(e.foldable, s"$fn size argument must be a literal, got: ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn size argument must be an integer literal, got: $other")
    }
  }
}

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
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigsExpr].getName, "minhash_sigs"),
      (children: Seq[Expression]) => MinhashSigsExpr(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64Expr].getName, "simhash64"),
      (children: Seq[Expression]) => Simhash64Expr(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalizeExpr(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash32_md5"),
      new ExpressionInfo(classOf[Simhash32Md5Expr].getName, "simhash32_md5"),
      (children: Seq[Expression]) => Simhash32Md5Expr(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("minhash_md5_sigs"),
      new ExpressionInfo(classOf[MinhashMd5SigsExpr].getName, "minhash_md5_sigs"),
      (children: Seq[Expression]) => MinhashMd5SigsExpr(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("md5_feature_counts"),
      new ExpressionInfo(classOf[Md5FeatureCountsExpr].getName, "md5_feature_counts"),
      (children: Seq[Expression]) => Md5FeatureCountsExpr(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("quantize_i8"),
      new ExpressionInfo(classOf[QuantizeInt8Expr].getName, "quantize_i8"),
      (children: Seq[Expression]) => QuantizeInt8Expr(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("quantize_i8b"),
      new ExpressionInfo(classOf[QuantizeInt8BytesExpr].getName, "quantize_i8b"),
      (children: Seq[Expression]) => QuantizeInt8BytesExpr(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("dot_i8"),
      new ExpressionInfo(classOf[DotI8Expr].getName, "dot_i8"),
      (children: Seq[Expression]) => DotI8Expr(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("lev_at_most"),
      new ExpressionInfo(classOf[LevAtMostExpr].getName, "lev_at_most"),
      (children: Seq[Expression]) => LevAtMostExpr(children(0), children(1), children(2))
    ))
    // native aggregate (not scalar): the analyzer wraps returned
    // AggregateFunctions in AggregateExpression like any built-in agg
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinctAgg].getName, "kmv_distinct"),
      (children: Seq[Expression]) => KmvDistinctAgg(children(0),
        GraftExtensions.literalK("kmv_distinct", children, 1))
    ))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (children: Seq[Expression]) => KmvSketchAgg(children(0),
        GraftExtensions.literalK("kmv_sketch", children, 1))
    ))
    ext.injectFunction((
      FunctionIdentifier("freq_topk"),
      new ExpressionInfo(classOf[FreqTopKAgg].getName, "freq_topk"),
      (children: Seq[Expression]) => FreqTopKAgg(children(0),
        GraftExtensions.literalK("freq_topk", children, 1))
    ))
    ext.injectFunction((
      FunctionIdentifier("kmv_quantile"),
      new ExpressionInfo(classOf[KmvQuantileAgg].getName, "kmv_quantile"),
      (children: Seq[Expression]) => KmvQuantileAgg(children(0),
        GraftExtensions.literalK("kmv_quantile", children, 1),
        GraftExtensions.literalK("kmv_quantile", children, 2))
    ))
    ext.injectFunction((
      FunctionIdentifier("kmv_quantile_sketch"),
      new ExpressionInfo(classOf[KmvQuantileSketchAgg].getName, "kmv_quantile_sketch"),
      (children: Seq[Expression]) => KmvQuantileSketchAgg(children(0),
        GraftExtensions.literalK("kmv_quantile_sketch", children, 1))
    ))
    ext.injectFunction((
      FunctionIdentifier("kmv_quantile_merge"),
      new ExpressionInfo(classOf[KmvQuantileMergeAgg].getName, "kmv_quantile_merge"),
      (children: Seq[Expression]) => KmvQuantileMergeAgg(children(0),
        GraftExtensions.literalK("kmv_quantile_merge", children, 1),
        GraftExtensions.literalK("kmv_quantile_merge", children, 2))
    ))
  }
}
