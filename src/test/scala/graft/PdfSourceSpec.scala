package graft

import graft.ops.Pipeline
import graft.sources.PdfSource

import java.nio.file.Files

import org.apache.spark.sql.functions._

class PdfSourceSpec extends SparkSpecBase {

  test("binaryFile PDF scan: partition-batched extraction, paragraph split, min-length filter") {
    val dir = Files.createTempDirectory("pdfs").toFile
    Files.write(new java.io.File(dir, "acme.pdf").toPath, Array.fill[Byte](64)(1))
    Files.write(new java.io.File(dir, "beta.pdf").toPath, Array.fill[Byte](128)(2))
    Files.writeString(new java.io.File(dir, "ignored.txt").toPath, "not a pdf")

    val out = PdfSource.readPdfParagraphs(spark, dir.getAbsolutePath,
      new PdfSource.FakePdfExtractor(pagesPerDoc = 2), minParagraphLength = 10)
    assert(out.schema.fieldNames.toSeq === Seq("pdf_name", "page", "para_idx", "paragraph"))
    assert(out.select("pdf_name").distinct().count() === 2) // glob filtered the .txt
    // 2 pdfs x 2 pages x 2 paragraphs, all above min length
    assert(out.count() === 8)
    // min-length filter drops everything at an absurd threshold
    assert(PdfSource.readPdfParagraphs(spark, dir.getAbsolutePath,
      new PdfSource.FakePdfExtractor(2), minParagraphLength = 1000).count() === 0)
  }

  test("extraction JSON write/read round-trip preserves the long table") {
    val dir = Files.createTempDirectory("pdfs2").toFile
    Files.write(new java.io.File(dir, "gamma.pdf").toPath, Array.fill[Byte](32)(3))
    val paras = PdfSource.readPdfParagraphs(spark, dir.getAbsolutePath,
      new PdfSource.FakePdfExtractor(3), minParagraphLength = 5)
    val outJson = Files.createTempDirectory("extr-out").toFile.getAbsolutePath
    PdfSource.writeExtractionJson(paras, outJson)
    val back = PdfSource.readExtractionRecords(spark, outJson)
    assert(back.orderBy("page", "para_idx").collect().map(r => (r.getInt(1), r.getString(3))).toSeq ===
      paras.orderBy("page", "para_idx").collect().map(r => (r.getInt(1), r.getString(3))).toSeq)
  }

  test("metrics JSON sink writes the Kubeflow envelope (S11)") {
    val p = Files.createTempFile("metrics", ".json")
    Pipeline.writeMetricsJson(Seq("row_count" -> 42.0, "t_join \"s\"" -> 1.5), p.toString)
    val txt = Files.readString(p)
    assert(txt.startsWith("""{"metrics": ["""))
    assert(txt.contains(""""name": "row_count", "numberValue": 42.0"""))
    assert(txt.contains("\\\"s\\\""))
  }
}
