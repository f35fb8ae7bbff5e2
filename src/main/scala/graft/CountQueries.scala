package graft

/** Dev tool: prints the registered-query census — the README/COVERAGE
  * headline counts are derived from THIS output, never by hand (three
  * rounds of off-by-one taught the lesson).
  */
object CountQueries {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    val rowsOnly = (q.keySet -- o.keySet).toSeq.sorted
    println(s"queries=${q.size} oracled=${(q.keySet & o.keySet).size} rows_only=${rowsOnly.size}")
    println(s"rows_only_list=${rowsOnly.mkString(",")}")
  }
}
