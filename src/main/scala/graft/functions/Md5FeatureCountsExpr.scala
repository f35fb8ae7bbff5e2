package graft.functions

import java.security.MessageDigest
import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Static kernel shared by interpreted eval and generated code. */
object Md5FeatureCounts {

  /** Hashed unigram+bigram feature-bucket counts for one token array,
    * pre-aggregated per document: returns array<struct<bucket, c>>
    * sorted by bucket.
    *
    * Bucket semantics are EXACTLY the DuckDB-replayable column
    * formulation the DSIR scorer is oracled against —
    * `pmod(conv(substring(md5(f), 1, 4), 16, 10), buckets)` where `f`
    * ranges over tokens and space-joined consecutive token pairs: the
    * first four hex chars of md5 are the first two digest bytes
    * big-endian, so the kernel reads the digest directly and never
    * materializes the 32-char hex string, the bigram concat (the
    * digest is fed token-bytes, 0x20, token-bytes — md5 of the
    * concatenation by construction), the substring, or the conv
    * parse. Bit-equality with the column formulation is spec-asserted
    * (`Bm25Spec`), which is what keeps the `x_dsir_*` oracles valid
    * over the fused path.
    *
    * Per-document aggregation happens HERE, in one pass over the
    * token array (collect 2n−1 bucket ids, sort, run-length encode),
    * so the consumer explodes distinct-buckets-per-doc rows (≤ 4096)
    * instead of one row per feature occurrence, and needs NO
    * groupBy(doc, bucket) Exchange at all — the shuffle the column
    * formulation paid to deduplicate feature occurrences disappears.
    *
    * Null elements cast no feature (defensive: the engine's
    * tokenizer never emits them; a public SQL function must not NPE);
    * an empty or all-null array returns an empty array, which the
    * downstream explode drops — same as the column formulation's
    * empty feature array.
    */
  def counts(arr: ArrayData, buckets: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val n  = arr.numElements()
    val ids = new Array[Long](if (n == 0) 0 else 2 * n - 1)
    var m = 0
    var prev: Array[Byte] = null
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val cur = arr.getUTF8String(j).getBytes
        md.reset(); md.update(cur)
        ids(m) = bucketOf(md.digest(), buckets); m += 1
        if (prev != null) {
          md.reset(); md.update(prev); md.update(0x20.toByte); md.update(cur)
          ids(m) = bucketOf(md.digest(), buckets); m += 1
        }
        prev = cur
      } else prev = null
      j += 1
    }
    Arrays.sort(ids, 0, m)
    // run-length encode the sorted ids into (bucket, c) structs
    var distinct = 0
    var i = 0
    while (i < m) { if (i == 0 || ids(i) != ids(i - 1)) distinct += 1; i += 1 }
    val out = new Array[AnyRef](distinct)
    var o = 0
    i = 0
    while (i < m) {
      var run = i + 1
      while (run < m && ids(run) == ids(i)) run += 1
      out(o) = new GenericInternalRow(Array[Any](ids(i), (run - i).toLong)); o += 1
      i = run
    }
    new GenericArrayData(out)
  }

  /** First two digest bytes big-endian mod buckets — ==
    * `conv(substring(hex, 1, 4), 16, 10) % buckets`, non-negative.
    */
  private def bucketOf(digest: Array[Byte], buckets: Int): Long =
    (((digest(0) & 0xff) << 8) | (digest(1) & 0xff)).toLong % buckets
}

/** Fused md5 feature-bucket counter as a native expression — the hot
  * stage of the DSIR-style hashed-affinity scorer
  * ([[graft.ops.TextAnalysis.hashedAffinityScore]]).
  *
  * Registered as SQL function `md5_feature_counts(tokens, buckets)`
  * via [[graft.GraftExtensions]]; `buckets` must be a foldable
  * positive integer.
  */
case class Md5FeatureCountsExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.foldable && right.dataType == IntegerType =>
      if (buckets > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"md5_feature_counts requires buckets > 0, got $buckets")
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"md5_feature_counts requires (array<string>, foldable int), got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  private lazy val buckets: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("bucket", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "md5_feature_counts"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Md5FeatureCounts.counts(a.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, _) =>
      s"graft.functions.Md5FeatureCounts.counts($a, $buckets)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
