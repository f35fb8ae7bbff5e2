package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** The whole MinHash signature in ONE pass: for `numHashes` seeded
  * hash functions, the per-seed minimum of `xxhash64(seed, h)` over a
  * shingle-hash array — `array<long> → array<long>`.
  *
  * Replaces `array((0 until k).map(i => array_min(transform(sh,
  * xxhash64(lit(i), _)))))`, which walks the shingle array k times and
  * materializes k transformed copies per row. This expression keeps k
  * running minima in a primitive accumulator and touches each shingle
  * hash once — the signature stage is the dominant cost of the fast
  * LSH flavors.
  *
  * Value-identical to the formulation it replaces: the per-seed seed
  * base replicates Spark's multi-arg xxhash64 chaining
  * (`hash = XXH64.hashInt(seed_i, 42); XXH64.hashLong(h, hash)`), so
  * signatures, bands, and est-Jaccard outputs are bit-for-bit
  * unchanged (asserted in spec).
  *
  * Registered as SQL function `minhash_sigs(sh, k)` via
  * [[graft.GraftExtensions]]; `k` must be a foldable integer.
  */
case class MinhashSigsExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) if right.foldable && right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires (array<bigint>, foldable int), got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  private lazy val numHashes: Int = right.eval().asInstanceOf[Int]

  /** Per-seed chain base: Spark's xxhash64(lit(i), h) hashes the int
    * literal first (seed 42), then the long through the running hash.
    */
  private lazy val seedBases: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr  = a.asInstanceOf[ArrayData]
    val n    = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, seedBases(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bases = ctx.addReferenceObj("seedBases", seedBases, "long[]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val m = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |long[] $m = new long[$numHashes];
         |java.util.Arrays.fill($m, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, $bases[$i]);
         |    if ($v < $m[$i]) $m[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($m);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
