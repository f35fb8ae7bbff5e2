package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel shared by interpreted eval and generated code. */
object SimhashMd5 {
  /** 32-bit SimHash over an array of md5-hex strings, one pass.
    * Bit b reads hex char b/4 (front of the string, matching the
    * column formulation's `substring(h, b/4+1, 1)`), bit b%4 of its
    * nibble; sign votes; `votes > 0` sets the bit.
    */
  def simhash32(arr: ArrayData): Long = {
    val n     = arr.numElements()
    val votes = new Array[Int](32)
    var j = 0
    while (j < n) {
      // null elements cast no votes (public SQL function — arbitrary
      // arrays must not NPE; matches null-dropping column algebra)
      if (arr.isNullAt(j)) { j += 1 }
      else {
      val s = arr.getUTF8String(j)
      var p = 0
      while (p < 8) {
        val nib = Character.digit(s.getByte(p).toChar, 16)
        var k = 0
        while (k < 4) {
          val b = p * 4 + k
          votes(b) += (if (((nib >> k) & 1) == 1) 1 else -1)
          k += 1
        }
        p += 1
      }
      j += 1
      }
    }
    var r = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }
}

/** 32-bit md5-hex SimHash as a native expression — the oracle-checkable
  * flavor ([[graft.ops.Dedup.simhash32Pairs]]). Replaces 32 separate
  * `aggregate` folds that each ran `conv(substring(h, b/4+1, 1), 16,
  * 10)` per (element, bit): one pass, each hex char parsed once.
  * Bit-identical to the column formulation (asserted in spec), so the
  * x_dedup_simhash DuckDB oracle is unchanged.
  *
  * Registered as SQL function `simhash32_md5` via
  * [[graft.GraftExtensions]].
  */
case class Simhash32Md5Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash32_md5 requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32_md5"

  override protected def nullSafeEval(a: Any): Any =
    SimhashMd5.simhash32(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimhashMd5.simhash32($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
