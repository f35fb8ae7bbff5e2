package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import java.util.regex.Pattern

/** `find_answer_start`: every start index of `answer` inside
  * `paragraph`, with numeric answers guarded by non-digit boundaries so
  * "0" does not match inside "2016".
  * Reference: src/components/preprocessing/base_kpi_inference_curator.py:129-156.
  *
  * Engine deviation (documented): the reference returns
  * `list(set(...))` whose order is a Python-set artifact; we return the
  * indices sorted ascending, which is deterministic and
  * oracle-checkable. The FARM start==0 workaround (prepend a space and
  * shift) lives in the curation op, not here
  * (kpi_inference_curator.py:355-358).
  */
object AnswerStart {

  def findAnswerStart(answer: String, par: String): Seq[Int] = {
    if (answer == null || par == null || answer.isEmpty) return Seq.empty
    // Reference escapes only "." before compiling the answer as regex.
    val escaped = answer.flatMap(c => if (c == '.') "\\." else c.toString)
    val isNumeric = answer.nonEmpty && answer.forall(_.isDigit)
    def starts(pattern: String): List[Int] = {
      val m   = Pattern.compile(pattern).matcher(par)
      val buf = List.newBuilder[Int]
      while (m.find()) buf += m.start()
      buf.result()
    }
    if (isNumeric) {
      val s1 = starts("[^0-9]" + escaped).map(_ + 1)
      val s2 = starts(escaped + "[^0-9]")
      (s1 ++ s2).distinct.sorted
    } else starts(escaped)
  }

  val findAnswerStartUdf = udf((answer: String, par: String) => findAnswerStart(answer, par))

  def find_answer_start(answer: Column, par: Column): Column =
    findAnswerStartUdf(answer, par)
}
