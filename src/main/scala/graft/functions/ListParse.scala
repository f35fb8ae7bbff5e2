package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parsers for the reference's stringified-Python-list cells
  * (`source_page`, `relevant_paragraphs`), including its bracket-typo
  * repair. Pure built-in expression chains (codegen'd, no UDF).
  */
object ListParse {

  /** `"[2, 3]"` (1-based page list, entries possibly like "02") →
    * ArrayType(IntegerType); null when unparseable (row then dropped).
    * Reference: src/components/utils/qa_utils.py:93-112 (`clean_page`).
    * Engine deviation: int pages (the reference re-stringifies them to
    * use as dict keys; we keep a typed column).
    */
  def parseSourcePages(c: Column): Column = {
    val trimmed = trim(c)
    when(trimmed === "[]", array().cast("array<int>"))
      .when(
        // strict digit-list validation: any non-integer entry means the
        // reference's literal_eval would raise → None → row dropped
        trimmed.rlike("^\\[\\s*\\d+(\\s*,\\s*\\d+)*\\s*\\]$"),
        transform(
          split(regexp_replace(trimmed, "^\\[|\\]$", ""), ","),
          x => trim(x).cast("int")
        )
      )
      .otherwise(lit(null).cast("array<int>"))
  }

  /** `'["para one", "para two"]'` with `{`/`]` bracket-typo repair and
    * both `", "` and `","` delimiter variants → ArrayType(StringType);
    * null when unrepairable.
    * Reference: src/components/preprocessing/kpi_inference_curator.py:194-271
    * (`clean_paragraph`): repair → strip `["` and `"]` → split at every
    * occurrence of either delimiter, in order (its two-pointer merge is
    * equivalent to an alternation split).
    */
  def parseParagraphList(c: Column): Column = {
    val strp = trim(c)
    // repair: leading '{'/']' → '['; else trailing '}'/'[' → ']'
    val headFixed = when(
      strp.rlike("^[{\\]]"),
      concat(lit("["), strp.substr(lit(2), length(strp)))
    ).otherwise(strp)
    val repaired = when(
      !strp.rlike("^[{\\]]") && strp.rlike("[}\\[]$"),
      concat(headFixed.substr(lit(1), length(headFixed) - 1), lit("]"))
    ).otherwise(headFixed)
    when(
      repaired.rlike("^\\[.*\\]$"),
      split(
        // strip the leading `["` and trailing `"]`
        repaired.substr(lit(3), length(repaired) - 4),
        "\", \"|\",\""
      )
    ).otherwise(lit(null).cast("array<string>"))
  }
}
