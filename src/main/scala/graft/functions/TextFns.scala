package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions re-expressing the reference's cleaning /
  * normalization surface (SURVEY.md §2.7) as codegen-friendly chains of
  * Spark built-ins — no UDFs in the hot path, so every call site stays
  * inside whole-stage codegen and predicate pushdown is unaffected.
  */
object TextFns {

  /** Curation-flavor clean_text.
    * Reference: src/components/preprocessing/base_curator.py:33-49.
    * Order of the substitutions is significant and preserved exactly.
    */
  def cleanText(c: Column): Column = {
    val c1 = regexp_replace(c, "(?<=\\[)“", "\"")
    val c2 = regexp_replace(c1, "”(?=\\])", "\"")
    val c3 = regexp_replace(c2, "“|”", "")
    val c4 = regexp_replace(c3, "\n|\t", " ")
    val c5 = regexp_replace(c4, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\xff]", "")
    regexp_replace(c5, "\\s{2,}", " ")
  }

  /** KPI-flavor clean_text: curation flavor (minus the tab rule) +
    * strip regex-special chars + lowercase + drop consecutive dots.
    * Reference: src/components/preprocessing/base_kpi_inference_curator.py:16-58.
    */
  def cleanTextKpi(c: Column): Column = {
    val c1 = regexp_replace(c, "(?<=\\[)“", "\"")
    val c2 = regexp_replace(c1, "”(?=\\])", "\"")
    val c3 = regexp_replace(c2, "“|”", "")
    val c4 = regexp_replace(c3, "\n", " ")
    val c5 = regexp_replace(c4, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\xff]", "")
    val c6 = regexp_replace(c5, "\\s{2,}", " ")
    val c7 = regexp_replace(c6, "[()^+*$|\\\\?\\[\\]{}]", "")
    regexp_replace(lower(c7), "\\.{2,}", "")
  }

  /** `"1 234,5"`-style numerics → double (strip spaces and commas).
    * Reference: notebooks/demo1[depracated]/demo1-create-tables.ipynb cell 9
    * (`str_w_spaces_to_numeric`).
    */
  def strWithSpacesToNumeric(c: Column): Column =
    regexp_replace(c, "[ ,]", "").cast("double")

  /** Repair malformed pdf filenames: `x,pdf` → `x.pdf`, missing
    * suffix → append `.pdf`.
    * Reference: src/components/utils/qa_utils.py:76-87.
    */
  def fixPdfName(c: Column): Column = {
    val fixedComma = regexp_replace(c, ",pdf$", ".pdf")
    when(fixedComma.rlike("\\.pdf$"), fixedComma)
      .otherwise(concat(fixedComma, lit(".pdf")))
  }

  /** `add_year` question templating: splice " in year {year}" before the
    * trailing question mark.
    * Reference: src/components/utils/kpi_mapping.py + kpi_inference_curator.py:115-125.
    */
  def templateQuestion(question: Column, year: Column, addYear: Column): Column =
    when(
      addYear,
      concat(substring_index(question, "?", 1), lit(" in year "), year.cast("string"), lit("?"))
    ).otherwise(question)

  /** Strip HTML tags, consuming at most one whitespace character after
    * each tag — the reference's exact regex, which matters for the NQ
    * chain's downstream token counting (`is_not_short` runs on the
    * stripped string). Reference: src/components/utils/nq_utils.py:19-21.
    */
  def removeHtmlTags(c: Column): Column = regexp_replace(c, "<[^>]+>\\s?", "")

  /** True when the text embeds an NQ-style `<Table>` block.
    * Reference: src/components/utils/nq_utils.py:11-17.
    */
  def containsTable(c: Column): Column = c.rlike("<Table>.*</Table>")

  /** Token-count "not short" predicate (strictly more than `n`
    * whitespace tokens). Reference: src/components/utils/nq_utils.py:20-26.
    */
  def isNotShort(c: Column, n: Int = 10): Column =
    size(split(c, " ")) > n

  /** Whitespace-token span [start, start+len) of a document, rejoined.
    * Reference: src/components/utils/nq_utils.py:6-8 (`get_text_section`).
    */
  def tokenSlice(c: Column, start: Int, len: Int): Column =
    array_join(slice(split(c, " "), start + 1, len), " ")

  /** Numeric-looking table cells are dropped before joining the rest
    * with ", ". Reference: src/models/farm_trainer.py:82-93.
    */
  def joinNonNumericCells(cells: Column): Column =
    array_join(filter(cells, c => !c.rlike("^\\W*[0-9]*\\W?[0-9]*?\\W*$")), ", ")

  /** Column-name snakify applied to schemas (driver-side string fn, not
    * a column expression).
    * Reference: notebooks/demo1[depracated]/demo1-create-tables.ipynb cell 9.
    */
  def snakify(name: String, maxLen: Int = 63): String = {
    val abbreviations = Seq(
      "average" -> "avg",
      "maximum" -> "max",
      "minimum" -> "min",
      "number"  -> "num"
    )
    var s = name.toLowerCase.trim
      .replace("-", "_")
      .replaceAll("[,.()&$/+]+", "")
      .replaceAll("\\s+", "_")
      .replaceAll("_+", "_")
    for ((long, short) <- abbreviations) s = s.replace(long, short)
    s.take(maxLen)
  }

  /** Snakify every column of a schema (returns old→new pairs). */
  def snakifyColumns(names: Seq[String]): Seq[(String, String)] =
    names.map(n => n -> snakify(n))
}
