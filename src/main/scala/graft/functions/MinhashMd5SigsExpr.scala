package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object MinhashMd5 {
  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2)     = HexDigits((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def sigs(arr: ArrayData, k: Int): ArrayData = {
    val md      = MessageDigest.getInstance("MD5")
    val mins    = new Array[String](k)
    val n       = arr.numElements()
    val prefix  = Array.tabulate(k)(i => s"$i:".getBytes(UTF_8))
    var j = 0
    while (j < n) {
      // null elements are skipped, mirroring the array_min(transform(
      // sh, md5(...))) formulation (md5(null) = null, array_min
      // ignores nulls) — the expression is a public SQL function, so
      // arbitrary arrays must not NPE
      if (!arr.isNullAt(j)) {
        val sBytes = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(prefix(i))
          md.update(sBytes)
          val h = hex(md.digest())
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins.map(s => UTF8String.fromString(s): AnyRef))
  }
}

/** The md5-flavor MinHash signature in ONE pass: per seed i, the
  * lexicographic minimum of `md5("i:" ++ shingle)` hex over the
  * doc's shingles — byte-identical to the
  * `array((0..k).map(i => array_min(transform(sh, s => md5(i: ⧺
  * s)))))` formulation (MD5 over the same UTF-8 bytes, lowercase hex,
  * ASCII string order = byte order), so the x_dedup_minhash DuckDB
  * oracle is untouched. Same md5 count, but one walk instead of k
  * materialized transformed arrays per row.
  *
  * Registered as SQL function `minhash_md5_sigs(shs, k)` via
  * [[graft.GraftExtensions]]; `k` must be a foldable integer.
  */
case class MinhashMd5SigsExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.foldable && right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_md5_sigs requires (array<string>, foldable int), got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  private lazy val numHashes: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_md5_sigs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinhashMd5.sigs(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, _) =>
      s"graft.functions.MinhashMd5.sigs($a, $numHashes)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
