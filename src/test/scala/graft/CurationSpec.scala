package graft

import graft.ops.Curation
import graft.sources.ExtractionJson

import java.nio.file.Files

import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private def annotations = Seq(
    // company, source_file, source_page, kpi_id, year, answer, data_type, relevant_paragraphs
    ("ACME", "acme.pdf", "[2]", 1.0, 2019, "42", "TEXT", """["para one", "para two"]"""),
    ("ACME", "acme.pdf", "[3, 4]", 2.1, 2019, "x", "TEXT", """["pa", "pb"]"""),
    ("ACME", "acme.pdf", "[3, 4]", 2.1, 2019, "x", "TEXT", """["only-one"]"""), // len mismatch → dropped
    ("BAD", "bad.pdf", "[1]", 1.0, 2019, "y", "TEXT", """["p"]"""),
    ("ACME", "acme.pdf", "[1]", 1.0, 2019, "z", "TABLE", """["p"]""")
  ).toDF("company", "source_file", "source_page", "kpi_id", "year", "answer", "data_type", "relevant_paragraphs")

  private def kpiMapping = Seq(
    (1.0, "what is q1?", false),
    (2.1, "what is q2?", true)
  ).toDF("kpi_id", "question", "add_year")

  test("curationFilter: data_type + exclusions") {
    val out = Curation.curationFilter(annotations, "TEXT", Seq("BAD"))
    assert(out.count() === 3)
  }

  test("splitMultiParagraph: broadcast single page, zip-explode aligned, silent drop on mismatch") {
    val parsed = Curation.parseListCells(Curation.curationFilter(annotations, "TEXT", Seq("BAD")))
    val out = Curation.splitMultiParagraph(parsed)
      .select("page", "paragraph").orderBy("page", "paragraph")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    // row 1: page 2 (1-based) → 1, both paragraphs; row 2: zip (3→2, 4→3); row 3 dropped
    assert(out === Array((1, "para one"), (1, "para two"), (2, "pa"), (3, "pb")))
  }

  test("posExamples joins questions and applies year templating") {
    val parsed = Curation.parseListCells(Curation.curationFilter(annotations, "TEXT", Seq("BAD")))
    val out = Curation.posExamples(parsed, kpiMapping)
    assert(out.filter(col("label") =!= 1).count() === 0)
    val q2 = out.filter(col("kpi_id") === 2.1).select("question").head().getString(0)
    assert(q2 === "what is q2 in year 2019?")
  }

  test("negExamples respects page>=3, non-source-page, min length, and ratio") {
    val parsed = Curation.parseListCells(
      Curation.curationFilter(annotations, "TEXT", Seq("BAD")))
      .withColumn("row_key", (col("kpi_id") * 10).cast("long"))
    val paragraphs = Seq(
      ("acme.pdf", 0, 0, "early page para long enough"),
      ("acme.pdf", 3, 0, "page three para long enough"),
      ("acme.pdf", 4, 0, "page four para long enough"),
      ("acme.pdf", 5, 0, "tiny"),
      ("acme.pdf", 6, 0, "page six para long enough")
    ).toDF("pdf_name", "page", "para_idx", "paragraph")
    val out = Curation.negExamples(parsed, paragraphs, negPosRatio = 2, minLength = 10)
    assert(out.filter(col("label") =!= 0).count() === 0)
    // never more than ratio per source row; never the tiny or early page
    assert(!out.select("context").collect().map(_.getString(0)).exists(_.contains("tiny")))
    assert(!out.select("context").collect().map(_.getString(0)).exists(_.contains("early")))
  }

  test("trainValSplit is disjoint, covering, and repartition-stable") {
    val df = (0L until 500L).toDF("k")
    val (tr1, va1) = Curation.trainValSplit(df, col("k"), 0.25)
    val (tr2, va2) = Curation.trainValSplit(df.repartition(11), col("k"), 0.25)
    assert(tr1.count() + va1.count() === 500)
    assert(va1.select("k").collect().map(_.getLong(0)).sorted ===
      va2.select("k").collect().map(_.getLong(0)).sorted)
    val ratio = va1.count().toDouble / 500
    assert(ratio > 0.15 && ratio < 0.35)
    assert(tr1.intersect(va1).count() === 0)
  }

  test("buildSquad + squadJson round-trips through the SQuAD reader") {
    val rows = Seq(
      ("acme.pdf", "ctx one", "q1", 1L, "42", Seq(3)),
      ("acme.pdf", "ctx one", "q2", 2L, "x", Seq.empty[Int]),
      ("acme.pdf", "ctx two", "q3", 3L, "y", Seq(0, 7))
    ).toDF("source_file", "paragraph", "question", "id", "answer", "answer_start")
    val json = Curation.squadJson(Curation.buildSquad(rows)).head().getString(0)
    val dir  = Files.createTempDirectory("squad").toFile
    Files.writeString(new java.io.File(dir, "squad.json").toPath, json)
    val back = ExtractionJson.readSquad(spark, dir.getAbsolutePath)
    assert(back.count() === 4) // q3 has two answers → two rows
    val impossible = back.filter(col("is_impossible")).select("question").collect().map(_.getString(0))
    assert(impossible === Array("q2"))
  }
}

class ExtractionJsonSpec extends SparkSpecBase {

  test("extraction JSON normalizes to (pdf_name, page, para_idx, paragraph)") {
    val dir = Files.createTempDirectory("extr").toFile
    Files.writeString(new java.io.File(dir, "acme.json").toPath,
      """{"pages": {"0": ["p zero a", "p zero b"], "1": ["p one"]}}""")
    Files.writeString(new java.io.File(dir, "beta.json").toPath,
      """{"pages": {"2": ["beta para"]}}""")
    val out = ExtractionJson.readExtraction(spark, dir.getAbsolutePath)
      .orderBy("pdf_name", "page", "para_idx").collect()
    assert(out.length === 4)
    assert(out.head.getString(0) === "acme")
    assert(out.head.getInt(1) === 0)
    assert(out.head.getString(3) === "p zero a")
    assert(out.last.getString(0) === "beta")
  }

  test("pdf_name with spaces survives the URI-encoded input_file_name") {
    val dir = Files.createTempDirectory("extr3").toFile
    Files.writeString(new java.io.File(dir, "Annual Report 2019.json").toPath,
      """{"pages": {"0": ["some paragraph"]}}""")
    val names = ExtractionJson.readExtraction(spark, dir.getAbsolutePath)
      .select("pdf_name").distinct().collect().map(_.getString(0))
    assert(names === Array("Annual Report 2019"))
  }

  test("root-map flavor parses the reference's native shape") {
    val dir = Files.createTempDirectory("extr2").toFile
    Files.writeString(new java.io.File(dir, "gamma.json").toPath,
      """{"0": ["root para a"], "3": ["root para b", "root para c"]}""")
    val out = ExtractionJson.readExtractionRootMap(spark, dir.getAbsolutePath)
      .orderBy("page", "para_idx").collect()
    assert(out.length === 3)
    assert(out.map(_.getString(3)).toSeq === Seq("root para a", "root para b", "root para c"))
  }
}
