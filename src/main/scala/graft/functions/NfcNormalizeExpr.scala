package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization kernel shared by the interpreted and
  * codegen paths of [[NfcNormalizeExpr]].
  */
object UnicodeNorm {

  /** Canonical composition (NFC). Already-normalized input — all of
    * ASCII, and virtually all real web text — takes the
    * `isNormalized` fast path and returns the INPUT UTF8String, zero
    * allocation beyond the one `toString` the JDK API needs.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string)` — Unicode canonical composition as a native
  * Catalyst expression, the canonicalization step a dedup key needs
  * before hashing: `é` typed as one code point (U+00E9) and as
  * `e` + combining acute (U+0065 U+0301) are byte-different, hash to
  * different MinHash/exact-dup keys, and so evade every
  * content-keyed dedup in the engine unless composed first. (The
  * classic dedup-evasion vector alongside zero-width characters,
  * which are a plain `regexp_replace` and need no custom kernel.)
  *
  * Spark has no built-in normalizer, and a Scala UDF would break
  * whole-stage codegen on exactly the hot path (corpus-wide key
  * derivation); this expression participates in codegen — the
  * generated code calls the static kernel directly, no row encoding,
  * no closure. DuckDB's `nfc_normalize` (utf8proc) is the oracle
  * twin: both implement Unicode canonical composition, and the
  * `x_text_nfc` gate proves them byte-equal on planted
  * composed/decomposed pairs.
  *
  * Scale shape: per-row, no shuffle, `isNormalized` fast path makes
  * the common (already-NFC) corpus a near-no-op.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; inference gives Seq[DataType] <: Seq[AbstractDataType]
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(a: Any): Any =
    UnicodeNorm.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Scala objects emit static forwarders: callable from generated Java.
    defineCodeGen(ctx, ev, a => s"graft.functions.UnicodeNorm.nfc($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
