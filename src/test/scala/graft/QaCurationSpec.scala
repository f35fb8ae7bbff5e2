package graft

import graft.ops.QaCuration

import org.apache.spark.sql.functions._

class QaCurationSpec extends SparkSpecBase {
  import spark.implicits._

  private def ann = Seq(
    // tie, source_file, page0, src_page, kpi_id, question, answer, paragraph
    (1L, "a.pdf", 0L, 1L, 2.0, "q-two?", "cash flow", "the cash flow grew"),
    (2L, "a.pdf", 1L, 2L, 1.0, "q-one?", "emissions", "emissions fell sharply"),
    (3L, "b.pdf", 0L, 1L, 3.0, "q-three?", "never-present", "unrelated text body")
  ).toDF("tie", "source_file", "page0", "src_page", "kpi_id", "question", "answer", "paragraph")

  test("farmShift prepends a space and shifts starts only when a span starts at 0") {
    val df = Seq(
      ("x", Seq(0, 7)),
      ("y", Seq(3))
    ).toDF("paragraph", "answer_start")
    val out = QaCuration.farmShift(df).orderBy("paragraph")
      .collect().map(r => (r.getString(0), r.getSeq[Int](1)))
    assert(out === Array((" x", Seq(1, 8)), ("y", Seq(3))))
  }

  test("answerable locates spans and drops rows with no span") {
    val out = QaCuration.answerable(ann)
    val rows = out.select("answer", "answer_start").orderBy("answer")
      .collect().map(r => (r.getString(0), r.getSeq[Int](1)))
    // "cash flow" at 4; "emissions" at 0 → FARM shift → 1; "never-present" dropped
    assert(rows === Array(("cash flow", Seq(4)), ("emissions", Seq(1))))
    val shifted = out.filter(col("answer") === "emissions")
      .select("paragraph").head().getString(0)
    assert(shifted === " emissions fell sharply")
  }

  test("extraAnswerable mines only OTHER pages of the same pdf and honors the kpi skip-list") {
    val cand = Seq(
      ("a.pdf", 0L, 10L, "more cash flow here"),   // same page as ann tie=1 → excluded for it
      ("a.pdf", 2L, 11L, "cash flow again"),        // other page → candidate
      ("a.pdf", 3L, 12L, "emissions mentioned"),    // kpi 1.0 skipped
      ("c.pdf", 5L, 13L, "cash flow elsewhere")     // different pdf → never joined
    ).toDF("source_file", "cand_page", "tie", "paragraph")
    val out = QaCuration.extraAnswerable(ann.drop("tie"), cand, skipKpiIds = Seq(1.0))
      .select("paragraph", "answer_start").collect()
      .map(r => (r.getString(0), r.getSeq[Int](1)))
    // span at 0 → FARM-shifted
    assert(out === Array((" cash flow again", Seq(1))))
  }

  test("unanswerable keeps relevant pairs off annotated pages without the annotated answer") {
    val rel = Seq(
      ("a.pdf", 1L, "q-two?", "some unannotated para", 1L),   // annotated page 1 → dropped
      ("a.pdf", 5L, "q-two?", "contains cash flow too", 2L),  // has the answer for q-two → dropped
      ("a.pdf", 5L, "q-one?", "contains cash flow too", 3L),  // answer belongs to OTHER question → kept
      ("a.pdf", 6L, "q-two?", "clean paragraph", 4L),         // kept
      ("z.pdf", 1L, "q-one?", "unannotated pdf", 5L)          // pdf not annotated → dropped
    ).toDF("pdf_name", "page_viewer", "text", "text_b", "tie")
    val out = QaCuration.unanswerable(rel,
        ann.select(col("source_file"), col("src_page"), col("question"), col("answer")))
      .orderBy("tie")
    val rows = out.select("question", "paragraph", "answer").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows === Array(
      ("q-one?", "contains cash flow too", ""),
      ("q-two?", "clean paragraph", "")))
    assert(out.select("answer_start").head().getSeq[Int](0).isEmpty)
  }

  test("qaDataset keep-first dedup prefers earlier families, then the tie column") {
    def fam(rows: Seq[(String, String, String, String, Seq[Int], Long)]) =
      rows.toDF("source_file", "question", "paragraph", "answer", "answer_start", "tie")
    val pos = fam(Seq(("a.pdf", "q", "p", "ans", Seq(2), 9L)))
    val ex = fam(Seq(
      ("a.pdf", "q", "p", "ans", Seq(2), 1L),      // duplicate of pos → loses (later family)
      ("a.pdf", "q", "p2", "ans", Seq(0), 7L),
      ("b.pdf", "q", "p2", "ans", Seq(0), 3L)))    // duplicate key of ↑ → tie 3 < 7 wins
    val out = QaCuration.qaDataset(Seq(pos, ex))
    assert(out.count() === 2)
    val kept = out.orderBy("paragraph").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(kept === Array(("a.pdf", "p"), ("b.pdf", "p2")))
    assert(out.columns.toSet === Set("source_file", "question", "paragraph", "answer", "answer_start"))
  }
}
