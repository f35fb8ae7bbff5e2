package graft

import graft.sources.XlsxSource

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

/** Writes a minimal real .xlsx (zip of OOXML parts) and reads it back
  * through the JDK-only reader: shared strings, inline strings,
  * numbers, booleans, sparse cells, named-sheet selection, header
  * projection, and the corrupt-file skip.
  */
class XlsxSourceSpec extends SparkSpecBase {

  /** Tiny xlsx writer: enough OOXML for the reader's subset. `rows`
    * are (ref, type, value) cells per row; type "s" indexes `shared`.
    */
  private def writeXlsx(
      path: String,
      sheets: Seq[(String, Seq[Seq[(String, String, String)]])],
      shared: Seq[String]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetTags</sheets></workbook>""")
    val relTags = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$relTags</Relationships>""")
    val sis = shared.map(s => s"<si><t>$s</t></si>").mkString
    put("xl/sharedStrings.xml",
      s"""<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${shared.size}" uniqueCount="${shared.size}">$sis</sst>""")
    sheets.zipWithIndex.foreach { case ((_, rows), si) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.map { case (ref, t, v) =>
          t match {
            case "inlineStr" => s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
            case ""          => s"""<c r="$ref"><v>$v</v></c>"""
            case tt          => s"""<c r="$ref" t="$tt"><v>$v</v></c>"""
          }
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      put(s"xl/worksheets/sheet${si + 1}.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""")
    }
    zos.close()
  }

  private def annotationSheet: Seq[Seq[(String, String, String)]] = Seq(
    // header row: shared strings 0..3
    Seq(("A1", "s", "0"), ("B1", "s", "1"), ("C1", "s", "2"), ("D1", "s", "3")),
    // ACME / 3.0 / [2] / TRUE
    Seq(("A2", "s", "4"), ("B2", "", "3.0"), ("C2", "inlineStr", "[2]"), ("D2", "b", "1")),
    // sparse row: company missing, kpi 1, page [1, 3], FALSE
    Seq(("B3", "", "1"), ("C3", "inlineStr", "[1, 3]"), ("D3", "b", "0"))
  )

  private val sharedStrings =
    Seq("company", "kpi_id", "source_page", "flag", "ACME")

  test("writeXlsx round-trips through readXlsx, escaping XML and skipping nulls") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsx-w").toString
    val df = Seq(
      ("a & b", "1.5", "x <tag> y"),
      ("plain", null, "z")
    ).toDF("company", "kpi_id", "note")
    XlsxSource.writeXlsx(df, s"$dir/out.xlsx", "data_ex_in_xls")
    val back = XlsxSource.readXlsx(spark, dir, "data_ex_in_xls")
      .orderBy("row_idx")
      .select("company", "kpi_id", "note").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(back === Array(
      ("a & b", "1.5", "x <tag> y"),
      ("plain", null, "z")))
  }

  test("readXlsx projects header-named string columns with typed-cell decoding") {
    val dir = Files.createTempDirectory("xlsx").toString
    writeXlsx(s"$dir/ann.xlsx",
      Seq("data_ex_in_xls" -> annotationSheet,
          "other_sheet"    -> Seq(Seq(("A1", "inlineStr", "junk")))),
      sharedStrings)
    val df = XlsxSource.readXlsx(spark, dir, "data_ex_in_xls")
    assert(df.columns.toSeq === Seq("file", "row_idx", "company", "kpi_id", "source_page", "flag"))
    val rows = df.orderBy("row_idx")
      .select("company", "kpi_id", "source_page", "flag")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rows === Array(
      ("ACME", "3.0", "[2]", "true"),
      (null, "1", "[1, 3]", "false")))
  }

  test("named-sheet selection reads the requested sheet only") {
    val dir = Files.createTempDirectory("xlsx2").toString
    writeXlsx(s"$dir/two.xlsx",
      Seq("data_ex_in_xls" -> annotationSheet,
          "other_sheet"    -> Seq(Seq(("A1", "inlineStr", "junk")))),
      sharedStrings)
    val other = XlsxSource.readXlsxRows(spark, dir, "other_sheet")
    assert(other.count() === 1)
    assert(other.select("cells").head().getSeq[String](0) === Seq("junk"))
  }

  test("corrupt workbooks and missing sheets are skipped, not failed") {
    val dir = Files.createTempDirectory("xlsx3").toString
    Files.write(java.nio.file.Paths.get(s"$dir/bad.xlsx"),
      "this is not a zip".getBytes(StandardCharsets.UTF_8))
    writeXlsx(s"$dir/good.xlsx", Seq("data_ex_in_xls" -> annotationSheet), sharedStrings)
    // bad.xlsx contributes zero rows; good one still parses
    val rows = XlsxSource.readXlsxRows(spark, dir, "data_ex_in_xls")
    assert(rows.select("file").distinct().collect().map(_.getString(0)).toSeq === Seq("good.xlsx"))
    assert(XlsxSource.readXlsxRows(spark, dir, "no_such_sheet").count() === 0)
  }

  test("feeds the curation filter chain end-to-end") {
    val dir = Files.createTempDirectory("xlsx4").toString
    writeXlsx(s"$dir/ann.xlsx", Seq("data_ex_in_xls" -> annotationSheet), sharedStrings)
    val ann = XlsxSource.readXlsx(spark, dir, "data_ex_in_xls")
      .withColumn("kpi_id", col("kpi_id").cast("double"))
    assert(ann.filter(col("kpi_id") === 3.0).count() === 1)
  }

  test("writeXlsx emits a valid OOXML package (root rels + content types), not just repo-readable parts") {
    // an INDEPENDENT OOXML reader resolves the package through
    // _rels/.rels and [Content_Types].xml — this repo's readXlsx
    // ignores both, so the round-trip gate can't catch their absence.
    // Validate the package the way a generic consumer does: walk
    // .rels to the officeDocument and check every part is typed.
    val dir  = Files.createTempDirectory("xlsx5").toString
    val path = s"$dir/out.xlsx"
    import spark.implicits._
    XlsxSource.writeXlsx(Seq(("a", 1), ("b", 2)).toDF("name", "n"), path, "data_ex_in_xls")
    val zf = new java.util.zip.ZipFile(path)
    def entry(n: String): String =
      new String(zf.getInputStream(zf.getEntry(n)).readAllBytes(), StandardCharsets.UTF_8)
    try {
      val rootRels = entry("_rels/.rels")
      assert(rootRels.contains(
        "Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\""))
      assert(rootRels.contains("Target=\"xl/workbook.xml\""))
      val ct = entry("[Content_Types].xml")
      assert(ct.contains("Default Extension=\"rels\""))
      assert(ct.contains("Default Extension=\"xml\""))
      assert(ct.contains("PartName=\"/xl/workbook.xml\""))
      assert(ct.contains("PartName=\"/xl/worksheets/sheet1.xml\""))
      assert(ct.contains("spreadsheetml.sheet.main+xml"))
      // the workbook's own rels must resolve the sheet target the
      // officeDocument declares
      assert(entry("xl/_rels/workbook.xml.rels").contains("Target=\"worksheets/sheet1.xml\""))
      // and the round-trip still reads back through the repo reader
      val back = XlsxSource.readXlsx(spark, dir, "data_ex_in_xls")
      assert(back.count() === 2)
    } finally zf.close()
  }

  test("writeXlsx refuses a frame over maxRows with a named error, before collecting") {
    // the guard is what turns a mis-pointed fact table into a loud
    // failure instead of a silent driver OOM (r8 verdict note)
    val dir  = java.nio.file.Files.createTempDirectory("xlsx-guard").toString
    val wide = spark.range(0, 50).selectExpr("id", "cast(id as string) as s")
    val e = intercept[IllegalArgumentException] {
      XlsxSource.writeXlsx(wide, s"$dir/too-big.xlsx", "data_ex_in_xls", maxRows = 10)
    }
    assert(e.getMessage.contains("XLSX_EXPORT_TOO_LARGE"))
    assert(!new java.io.File(s"$dir/too-big.xlsx").exists(),
      "guard must fire before any bytes are written")
    // at exactly the limit the write proceeds
    XlsxSource.writeXlsx(wide.limit(10), s"$dir/ok.xlsx", "data_ex_in_xls", maxRows = 10)
    assert(new java.io.File(s"$dir/ok.xlsx").exists())
  }
}
