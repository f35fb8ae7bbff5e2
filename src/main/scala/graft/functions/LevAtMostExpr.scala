package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object LevAtMost {
  /** Banded Levenshtein with early exit: returns ed(a,b) if ≤ k, else
    * k+1. The DP only visits cells within the ±k diagonal band —
    * O((2k+1)·n) time and O(n) space versus the full O(|a|·|b|)
    * table — and bails as soon as every band cell exceeds k. For the
    * ed ≤ 1 verify step of a similarity join this is the difference
    * between ~3·n and n² cell updates per candidate pair.
    *
    * Unicode note: operates on UTF-16 code units (String charAt),
    * matching Spark's and DuckDB's `levenshtein` on the BMP inputs
    * the queries use.
    */
  def levAtMost(sa: String, sb: String, k: Int): Int = {
    val (a, b) = if (sa.length <= sb.length) (sa, sb) else (sb, sa)
    val la = a.length
    val lb = b.length
    val INF = k + 1
    if (lb - la > k) return INF
    if (la == 0) return lb // ≤ k by the guard above
    // row-rolled DP over the ±k diagonal band; cells outside the band
    // hold INF so in-band lookups never need bounds branches beyond
    // the one sentinel write per roll
    val prev = new Array[Int](lb + 1)
    val cur  = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= k) j else INF; j += 1 }
    var i = 1
    while (i <= la) {
      val lo = math.max(1, i - k)
      val hi = math.min(lb, i + k)
      // left boundary cell (i, lo-1): j=0 costs i deletions; any
      // other out-of-band cell is INF
      cur(lo - 1) = if (lo == 1 && i <= k) i else INF
      var best = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1    // prev(i+k) is the INF sentinel from the last roll
        val ins = cur(j - 1) + 1
        var v = sub
        if (del < v) v = del
        if (ins < v) v = ins
        if (v > INF) v = INF     // cap so INF+1 can't overflow-creep
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best >= INF) return INF // whole band over budget — early exit
      j = lo - 1
      while (j <= hi) { prev(j) = cur(j); j += 1 }
      if (hi < lb) prev(hi + 1) = INF // sentinel for next row's del at j = i+1+k
      i += 1
    }
    math.min(prev(lb), INF)
  }

  def eval(a: UTF8String, b: UTF8String, k: Int): Int =
    levAtMost(a.toString, b.toString, k)
}

/** `lev_at_most(a, b, k)`: Levenshtein distance capped at k+1 via the
  * banded DP (see [[LevAtMost.levAtMost]]). Drop-in for
  * `levenshtein(a,b) <= k` predicates: `lev_at_most(a,b,k) <= k` is
  * equivalent but O(k·n) per pair instead of O(n²) — the verify step
  * of [[graft.ops.Dedup.editDistancePairs]] at corpus scale.
  * Registered as a SQL function via [[graft.GraftExtensions]];
  * parity with `levenshtein` is spec'd (`EditDistanceSpec`).
  */
case class LevAtMostExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
      third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"lev_at_most requires (string, string, int), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_at_most"

  override protected def nullSafeEval(a: Any, b: Any, k: Any): Any =
    LevAtMost.eval(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) => {
      val kernel = LevAtMost.getClass.getName.stripSuffix("$")
      s"${ev.value} = $kernel$$.MODULE$$.eval($a, $b, $k);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
