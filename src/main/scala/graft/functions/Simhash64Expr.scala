package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over an `array<long>` of token hashes in ONE pass:
  * per-bit sign votes accumulated in a primitive counter array, then
  * folded into the fingerprint.
  *
  * Replaces the 64 separate `aggregate(...)` higher-order folds of the
  * column-algebra formulation — which walk the token-hash array 64
  * times per row with per-element boxing, and were measured as the
  * dominant cost of the whole fast-SimHash pipeline (2.0 s of a 3.7 s
  * query at sf0.1). Bit-identical by construction: same +1/−1 vote per
  * (token, bit), same `votes > 0` threshold (asserted in spec).
  *
  * Registered as SQL function `simhash64` via [[graft.GraftExtensions]].
  */
case class Simhash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val arr   = a.asInstanceOf[ArrayData]
    val n     = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("votes")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |int[] $v = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $v[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($v[$b] > 0) $r |= (1L << $b);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
