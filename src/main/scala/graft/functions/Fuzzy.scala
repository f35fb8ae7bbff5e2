package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Fuzzy string-match scores (0-100) used by the reference's
  * best-match joins: `fuzz.token_set_ratio` picks the table CSV
  * matching an annotated answer, `fuzz.partial_ratio` picks the best
  * paragraph (reference: src/components/preprocessing/table_curator.py:169-191,
  * kpi_inference_curator.py:273-302).
  *
  * Semantics follow the python-Levenshtein flavor: `ratio` is based on
  * InDel distance (substitution costs 2), `token_set_ratio` compares
  * the sorted-token intersection/difference reconstructions, and
  * `partial_ratio` is the best `ratio` of the shorter string against
  * any equal-length window of the longer (a superset of the reference's
  * matching-block candidates; documented engine semantics).
  *
  * Implemented as Scala functions + UDFs: these only ever run on small
  * candidate sets after a blocking join, never on the full fact table,
  * so UDF (non-codegen) cost is acceptable.
  */
object Fuzzy {

  /** InDel distance: Levenshtein where substitution costs 2. */
  def indelDistance(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val prev = Array.tabulate(lb + 1)(identity)
    val cur  = new Array[Int](lb + 1)
    var i = 1
    while (i <= la) {
      cur(0) = i
      var j = 1
      while (j <= lb) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 2)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      Array.copy(cur, 0, prev, 0, lb + 1)
      i += 1
    }
    prev(lb)
  }

  /** fuzz.ratio: round(100 * (la+lb-dist)/(la+lb)). Rounding is
    * half-even (Math.rint) to match Python 3's round() used by
    * fuzzywuzzy's utils.intr — half-up would flip .5-boundary scores.
    */
  def ratio(a: String, b: String): Int = {
    val lensum = a.length + b.length
    if (lensum == 0) return 100
    math.rint(100.0 * (lensum - indelDistance(a, b)) / lensum).toInt
  }

  /** fuzz.partial_ratio: best ratio of the shorter string vs any
    * equal-length window of the longer.
    */
  def partialRatio(a: String, b: String): Int = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 100 else 0
    if (s.length == l.length) return ratio(s, l)
    var best = 0
    var i = 0
    while (i <= l.length - s.length && best < 100) {
      best = math.max(best, ratio(s, l.substring(i, i + s.length)))
      i += 1
    }
    best
  }

  /** fuzzywuzzy utils.full_process: non-alphanumerics (unicode word
    * chars kept, so letters/digits/_) → space, lowercase, trim —
    * token_set_ratio applies it by default in the reference
    * (table_curator.py:186), so 'Total CO2:' matches 'total co2'.
    */
  def fullProcess(s: String): String =
    s.replaceAll("(?U)\\W", " ").toLowerCase.trim

  private def tokenSet(s: String): Set[String] =
    fullProcess(s).split("\\s+").filter(_.nonEmpty).toSet

  /** fuzz.token_set_ratio. */
  def tokenSetRatio(a: String, b: String): Int = {
    val ta = tokenSet(a); val tb = tokenSet(b)
    val inter = (ta intersect tb).toSeq.sorted.mkString(" ")
    val d1    = (ta diff tb).toSeq.sorted.mkString(" ")
    val d2    = (tb diff ta).toSeq.sorted.mkString(" ")
    val t0 = inter.trim
    val t1 = (inter + " " + d1).trim
    val t2 = (inter + " " + d2).trim
    math.max(ratio(t0, t1), math.max(ratio(t0, t2), ratio(t1, t2)))
  }

  val ratioUdf         = udf((a: String, b: String) => ratio(Option(a).getOrElse(""), Option(b).getOrElse("")))
  val partialRatioUdf  = udf((a: String, b: String) => partialRatio(Option(a).getOrElse(""), Option(b).getOrElse("")))
  val tokenSetRatioUdf = udf((a: String, b: String) => tokenSetRatio(Option(a).getOrElse(""), Option(b).getOrElse("")))

  def token_set_ratio(a: Column, b: Column): Column = tokenSetRatioUdf(a, b)
  def partial_ratio(a: Column, b: Column): Column  = partialRatioUdf(a, b)
  def fuzz_ratio(a: Column, b: Column): Column     = ratioUdf(a, b)
}
