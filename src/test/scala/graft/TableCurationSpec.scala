package graft

import graft.functions.Fuzzy
import graft.ops.TableCuration

import org.apache.spark.sql.functions._

class TableCurationSpec extends SparkSpecBase {
  import spark.implicits._

  private def tables = Seq(
    ("acme_page2_0.csv", "total co2 emissions 42 tonnes"),
    ("acme_page2_1.csv", "employee headcount by region"),
    ("acme_page3_0.csv", "revenue 2019 split"),
    ("beta_page2_0.csv", "total co2 emissions 42 tonnes"),
    ("gamma_page1_0.csv", "unrelated metrics")
  ).toDF("table_filename", "table_text")

  private def ann = Seq(
    // row_key, company, year, question, answer, source_file, pages
    (1L, "ACME", 2019, "what is co2?", "co2 emissions 42", "acme.pdf", Seq(2, 5)),
    (2L, "BETA", 2020, "what is co2?", "co2 emissions 42", "beta.pdf", Seq(2))
  ).toDF("row_key", "company", "year", "question", "answer", "source_file", "pages")

  test("tableMeta parses pdf name and page from extraction filenames") {
    val m = TableCuration.tableMeta(tables)
      .select("table_filename", "pdf_name", "page").orderBy("table_filename")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(m.head === ("acme_page2_0.csv", "acme.pdf", 2))
    assert(m.last === ("gamma_page1_0.csv", "gamma.pdf", 1))
  }

  test("posExamples picks the best-scoring table per page and skips empty pages") {
    val pos = TableCuration.posExamples(
      ann, TableCuration.tableMeta(tables), Fuzzy.token_set_ratio)
    val rows = pos.select("row_key", "table_filename", "label")
      .orderBy("row_key").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // row 1: page 2 → co2 table beats headcount table; page 5 → no tables, skipped
    // row 2: its own pdf's co2 table
    assert(rows === Array((1L, "acme_page2_0.csv", 1), (2L, "beta_page2_0.csv", 1)))
  }

  test("negExamples takes same-pdf tables first and tops up from the cross-pdf pool") {
    val meta = TableCuration.tableMeta(tables)
    val pos  = TableCuration.posExamples(ann, meta, Fuzzy.token_set_ratio)
      .join(ann.select(col("row_key").as("k"), col("source_file")), col("row_key") === col("k"))
      .drop("k")
    val neg = TableCuration.negExamples(pos, meta, negPosRatio = 2, poolSize = 5)
    val byRow = neg.select("row_key", "table_filename").collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // row 1: acme has 2 other tables → exactly those, no pool
    assert(byRow(1L) === Set("acme_page2_1.csv", "acme_page3_0.csv"))
    // row 2: beta has no other table → 2 pool picks, never beta's own
    assert(byRow(2L).size === 2)
    assert(byRow(2L).forall(f => !f.startsWith("beta")))
    assert(neg.filter(col("label") =!= 0 || col("answer").isNotNull).count() === 0)
  }

  test("cross-pdf pool plans as a partial top-k, not a global sort or single-partition window") {
    // repartition so the local relation can't constant-fold the limit
    // away at planning — we want the distributed physical shape
    val meta = TableCuration.tableMeta(tables.repartition(3))
    val pos  = TableCuration.posExamples(ann, meta, Fuzzy.token_set_ratio)
      .join(ann.select(col("row_key").as("k"), col("source_file")), col("row_key") === col("k"))
      .drop("k")
    // poolSize below the table count — a pool >= the input lets
    // Catalyst elide the limit (and then the sort) entirely
    val plan = TableCuration.negExamples(pos, meta, negPosRatio = 2, poolSize = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"pool truncation should be a partial per-partition top-k:\n$plan")
  }

  test("dataset emits the reference's columns with labeled pos+neg rows") {
    val out = TableCuration.dataset(ann, tables, Fuzzy.token_set_ratio,
      negPosRatio = 2, poolSize = 5)
    assert(out.columns.toSeq ===
      Seq("company", "year", "question", "answer", "table_filename", "label"))
    assert(out.filter(col("label") === 1).count() === 2)
    assert(out.filter(col("label") === 0).count() === 4)
  }
}
