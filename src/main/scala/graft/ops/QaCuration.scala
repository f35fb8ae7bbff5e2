package graft.ops

import graft.functions.AnswerStart

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** QA (SQuAD-flavor) curation: turn annotations + extracted paragraphs
  * + relevance-model output into answerable / synthetic-answerable /
  * unanswerable examples
  * (reference: src/components/preprocessing/kpi_inference_curator.py:362-425
  * `curate` → `create_answerable` / `find_extra_answerable` /
  * `create_unanswerable`).
  *
  * Scale shape: annotations are a small dim (they broadcast
  * everywhere); the only large inputs are the paragraph corpus and the
  * relevance output, and each is touched once — extra-answerable is a
  * keyed join on source_file (never a cross join), unanswerable is
  * three anti/semi joins against broadcast annotation slices.
  */
object QaCuration {

  /** The FARM start==0 workaround: a span starting at index 0 breaks
    * FARM's QA head, so the reference prepends one space and shifts
    * every start (kpi_inference_curator.py:355-358, 504-507). Expects
    * `paragraph` / `answer_start` columns.
    */
  def farmShift(df: DataFrame): DataFrame =
    df.withColumn("paragraph",
        when(array_contains(col("answer_start"), 0), concat(lit(" "), col("paragraph")))
          .otherwise(col("paragraph")))
      .withColumn("answer_start",
        when(array_contains(col("answer_start"), 0), transform(col("answer_start"), _ + 1))
          .otherwise(col("answer_start")))

  /** Answerable examples from annotations:
    * (source_file, question, answer, paragraph, ...) → answer_start
    * located, FARM-shifted, rows with no located span dropped
    * (create_answerable, kpi_inference_curator.py:427-462).
    */
  def answerable(ann: DataFrame): DataFrame =
    farmShift(
      ann.withColumn("answer_start",
        AnswerStart.find_answer_start(col("answer"), col("paragraph"))))
      .filter(size(col("answer_start")) > 0)

  /** Synthetic positives: scan every OTHER page's paragraphs of the
    * same pdf for the annotated answer (find_extra_answerable,
    * kpi_inference_curator.py:464-529). `ann` needs
    * (source_file, page0, kpi_id, question, answer);
    * `paragraphs` needs (source_file, cand_page, cand_id, paragraph).
    * `skipKpiIds` mirrors the reference's year/company skip-list
    * (`float(kpi_id) in [0, 1, 9, 11]`).
    */
  def extraAnswerable(ann: DataFrame, paragraphs: DataFrame, skipKpiIds: Seq[Double]): DataFrame =
    farmShift(
      ann
        .filter(!col("kpi_id").isin(skipKpiIds: _*))
        .drop("paragraph")
        .join(paragraphs, Seq("source_file"))
        .filter(col("cand_page") =!= col("page0"))
        .withColumn("answer_start",
          AnswerStart.find_answer_start(col("answer"), col("paragraph"))))
      .filter(size(col("answer_start")) > 0)

  /** Unanswerable examples from relevance-model output
    * (create_unanswerable + filter_relevant_examples,
    * kpi_inference_curator.py:530-640): keep relevant (question,
    * paragraph) pairs of ANNOTATED pdfs, drop pairs on an annotated
    * page, drop pairs whose paragraph contains an annotated answer to
    * the same question; answer becomes '' with no spans.
    * `relevant` needs (pdf_name, page_viewer, text, text_b, tie);
    * `ann` needs (source_file, src_page, question, answer).
    */
  def unanswerable(relevant: DataFrame, ann: DataFrame): DataFrame = {
    val pdfs     = ann.select(col("source_file")).distinct()
    val annPages = ann.select(col("source_file"), col("src_page")).distinct()
    val qa = ann.select(
      col("source_file").as("qa_pdf"), col("question").as("qa_q"), col("answer").as("qa_a")).distinct()
    relevant
      .join(broadcast(pdfs), col("pdf_name") === col("source_file"), "left_semi")
      .join(broadcast(annPages),
        col("pdf_name") === col("source_file") && col("page_viewer") === col("src_page"),
        "left_anti")
      .join(broadcast(qa),
        col("pdf_name") === col("qa_pdf") && col("text") === col("qa_q") &&
          col("text_b").contains(col("qa_a")),
        "left_anti")
      .select(
        col("pdf_name").as("source_file"),
        col("text").as("question"),
        col("text_b").as("paragraph"),
        lit("").as("answer"),
        array().cast("array<int>").as("answer_start"),
        col("tie"))
  }

  /** Union the three example families and keep-first-dedup on
    * (answer, paragraph, question) — the reference's concat +
    * drop_duplicates order (answerable, then synthetic, then
    * unanswerable; kpi_inference_curator.py:396-403, 448-455) becomes
    * an explicit (priority, tiebreak) window order so the survivor is
    * partition-layout-independent. Inputs must share
    * (source_file, question, paragraph, answer, answer_start) plus a
    * `tie` column; priorities are assigned from argument order.
    */
  def qaDataset(families: Seq[DataFrame]): DataFrame = {
    val cols = Seq("source_file", "question", "paragraph", "answer", "answer_start", "tie")
    val unioned = families.zipWithIndex
      .map { case (df, i) =>
        df.select(cols.map(col): _*).withColumn("priority", lit(i))
      }
      .reduce(_.unionByName(_))
    Dedup
      .dedupKeepFirst(unioned, Seq("answer", "paragraph", "question"),
        Seq(col("priority").asc, col("tie").asc))
      .drop("priority", "tie")
  }
}
