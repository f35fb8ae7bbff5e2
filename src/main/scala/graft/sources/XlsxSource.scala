package graft.sources

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal XLSX annotation reader — closes the reference's last input
  * gap (annotation excels read with pd.read_excel(sheet_name=
  * "data_ex_in_xls"); reference: src/components/preprocessing/
  * table_curator.py:381-386, src/components/utils/qa_utils.py:10-42)
  * without any library beyond the JDK: an .xlsx file is a zip of XML
  * parts, so java.util.zip + StAX cover the subset annotation
  * workbooks use (shared/inline strings, numbers, booleans, sparse
  * cells, named sheets).
  *
  * Scale shape: annotation workbooks are dim-scale (hundreds of rows);
  * parallelism is per FILE via the binaryFile source — each task
  * parses whole workbooks, which is the right granularity because a
  * zip member cannot be split. Not intended for fact-scale data;
  * fact tables arrive as parquet/csv.
  */
object XlsxSource {

  /** Write a dim-scale DataFrame as a single-sheet .xlsx (header row =
    * column names, every value an inline string, nulls as absent
    * cells) — the round-trip partner of [[readXlsx]], used to export
    * curated annotations back to the spreadsheet workflow and to put
    * the whole OOXML decode path under the DuckDB oracle gate
    * (`s4_xlsx_roundtrip`). Driver-side single file by design:
    * annotation workbooks are hundreds of rows, and a zip is not
    * splittable anyway (see the reader's scale note).
    *
    * `maxRows` enforces that dim-only contract: the frame is
    * materialized on the driver, so a caller mis-pointing this at a
    * fact table would OOM the driver silently — instead the guard
    * counts `maxRows + 1` rows (a cheap LIMIT, not a full count) and
    * fails with a named error BEFORE collecting anything. Raise the
    * parameter deliberately if a genuinely larger export is intended.
    */
  def writeXlsx(df: DataFrame, path: String, sheetName: String,
      maxRows: Int = 100000): Unit = {
    val cols = df.columns
    if (df.limit(maxRows + 1).count() > maxRows)
      throw new IllegalArgumentException(
        s"XLSX_EXPORT_TOO_LARGE: writeXlsx materializes the frame on the driver and is " +
          s"contracted for dim-scale annotation tables; input exceeds maxRows=$maxRows. " +
          "Write parquet/csv for fact-scale data, or raise maxRows deliberately.")
    val data = df.collect()
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def colLetters(i: Int): String =
      if (i < 26) ('A' + i).toChar.toString
      else ('A' + i / 26 - 1).toChar.toString + ('A' + i % 26).toChar
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes(UTF_8))
      zos.closeEntry()
    }
    try {
      // Real OOXML package metadata, not just the parts this repo's
      // own reader consults: a root _rels/.rels naming the workbook
      // as the officeDocument, and [Content_Types] Defaults/Overrides
      // for every part. Excel/LibreOffice/openpyxl refuse packages
      // without them — and "export back to the spreadsheet workflow"
      // means an independent reader must open the file.
      put("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
      put("_rels/.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
      put("xl/workbook.xml",
        s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
      val header = cols.zipWithIndex.map { case (c, i) =>
        s"""<c r="${colLetters(i)}1" t="inlineStr"><is><t>${esc(c)}</t></is></c>"""
      }.mkString
      val body = data.zipWithIndex.map { case (row, ri) =>
        val cells = cols.indices.flatMap { i =>
          Option(row.get(i)).map { v =>
            s"""<c r="${colLetters(i)}${ri + 2}" t="inlineStr"><is><t>${esc(v.toString)}</t></is></c>"""
          }
        }.mkString
        s"""<row r="${ri + 2}">$cells</row>"""
      }.mkString
      put("xl/worksheets/sheet1.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1">$header</row>$body</sheetData></worksheet>""")
    } finally zos.close()
  }

  private val ColRef = "^([A-Z]+)([0-9]+)$".r

  private def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  private def secureFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private def readZipEntries(bytes: Array[Byte], wanted: String => Boolean): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && wanted(e.getName)) out(e.getName) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  /** <si> entries of sharedStrings.xml; rich-text runs concatenate
    * their <t> parts the way Excel renders them.
    */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r   = secureFactory().createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false
    var inT  = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" if inSi => inT = false
              case "si" => out += cur.toString; inSi = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** workbook.xml sheet name → r:id, then workbook.xml.rels r:id →
    * part path under xl/.
    */
  private def sheetPath(parts: Map[String, Array[Byte]], sheetName: String): Option[String] = {
    val wb = parts.get("xl/workbook.xml").map { b =>
      val r = secureFactory().createXMLStreamReader(new ByteArrayInputStream(b))
      val m = mutable.Map.empty[String, String]
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
            var name: String = null; var rid: String = null
            (0 until r.getAttributeCount).foreach { i =>
              r.getAttributeLocalName(i) match {
                case "name" => name = r.getAttributeValue(i)
                case "id"   => rid = r.getAttributeValue(i)
                case _ =>
              }
            }
            if (name != null && rid != null) m(name) = rid
          }
        }
      } finally r.close()
      m.toMap
    }
    val rels = parts.get("xl/_rels/workbook.xml.rels").map { b =>
      val r = secureFactory().createXMLStreamReader(new ByteArrayInputStream(b))
      val m = mutable.Map.empty[String, String]
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
            var id: String = null; var target: String = null
            (0 until r.getAttributeCount).foreach { i =>
              r.getAttributeLocalName(i) match {
                case "Id"     => id = r.getAttributeValue(i)
                case "Target" => target = r.getAttributeValue(i)
                case _ =>
              }
            }
            if (id != null && target != null) m(id) = target
          }
        }
      } finally r.close()
      m.toMap
    }
    for {
      rid    <- wb.flatMap(_.get(sheetName))
      target <- rels.flatMap(_.get(rid))
    } yield if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
  }

  /** One worksheet → (rowIndex, colIndex, value) cells. Cell types:
    * t="s" shared string, t="inlineStr", t="b" boolean, default =
    * number/formula-cached value (emitted as its raw string).
    */
  private def parseSheetCells(
      bytes: Array[Byte], shared: IndexedSeq[String]): Seq[(Int, Int, String)] = {
    val r   = secureFactory().createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer.empty[(Int, Int, String)]
    var rowIdx = -1
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    var nextColInRow = 0
    val text = new StringBuilder
    def flushCell(): Unit = if (cellCol >= 0 && text.nonEmpty) {
      val raw = text.toString
      val v = cellType match {
        case "s" =>
          val i = raw.trim.toInt
          if (i >= 0 && i < shared.length) shared(i) else null
        case "b" => if (raw.trim == "1") "true" else "false"
        case _   => raw
      }
      if (v != null) out += ((rowIdx, cellCol, v))
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                val ra = Option(r.getAttributeValue(null, "r"))
                rowIdx = ra.map(_.toInt - 1).getOrElse(rowIdx + 1)
                nextColInRow = 0
              case "c" =>
                text.clear()
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                cellCol = Option(r.getAttributeValue(null, "r")) match {
                  case Some(ColRef(letters, _)) => colIndex(letters)
                  case _                        => nextColInRow
                }
                nextColInRow = cellCol + 1
              case "v" => inV = true
              case "t" => inIsT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV || (inIsT && cellType == "inlineStr") =>
            text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "c" => flushCell(); cellCol = -1
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** Parse one workbook's named sheet into dense rows (padded to the
    * sheet's max width so downstream array indexing is ANSI-safe;
    * absent cells are null). Returns empty when the sheet is missing —
    * the reference logs-and-skips corrupt/missing-sheet workbooks
    * (table_curator.py:381-395), so a bad file must not fail the job.
    */
  private[graft] def parseWorkbook(
      bytes: Array[Byte], sheetName: String): Seq[(Int, Seq[String])] =
    try {
      val parts = readZipEntries(bytes, n =>
        n == "xl/workbook.xml" || n == "xl/_rels/workbook.xml.rels" ||
          n == "xl/sharedStrings.xml" || n.startsWith("xl/worksheets/"))
      sheetPath(parts, sheetName).flatMap(parts.get) match {
        case None => Seq.empty
        case Some(sheetBytes) =>
          val shared = parts.get("xl/sharedStrings.xml")
            .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
          val cells = parseSheetCells(sheetBytes, shared)
          if (cells.isEmpty) Seq.empty
          else {
            val width = cells.map(_._2).max + 1
            cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (ri, cs) =>
              val row = Array.fill[String](width)(null)
              cs.foreach { case (_, ci, v) => row(ci) = v }
              (ri, row.toSeq)
            }
          }
      }
    } catch { case _: Exception => Seq.empty }

  /** All .xlsx workbooks under `dir`, one long-form row per sheet row:
    * (file, row_idx, cells). Distribution is per file (binaryFile
    * source); parsing happens on executors.
    */
  def readXlsxRows(spark: SparkSession, dir: String, sheetName: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.xlsx").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val file = path.substring(path.lastIndexOf('/') + 1)
        parseWorkbook(bytes, sheetName).map { case (ri, cells) => (file, ri, cells) }
      })
      .toDF("file", "row_idx", "cells")
  }

  /** Header-projected form: the first sheet row names the columns
    * (pd.read_excel's default), every later row becomes a data row.
    * All columns are strings — the annotation pipeline's typed parses
    * (kpi_id float, year int, stringified lists) happen downstream, as
    * they do in the reference curators.
    */
  def readXlsx(spark: SparkSession, dir: String, sheetName: String): DataFrame = {
    val rows = readXlsxRows(spark, dir, sheetName)
    val header = rows.filter(col("row_idx") === 0)
      .select(col("cells")).limit(1).collect()
      .headOption.map(_.getSeq[String](0)).getOrElse(Seq.empty)
    // try_element_at: a workbook narrower than the header file must
    // yield nulls, not an ANSI out-of-bounds error
    val dataCols = header.zipWithIndex.map { case (name, i) =>
      try_element_at(col("cells"), lit(i + 1)).as(Option(name).getOrElse(s"_c$i"))
    }
    rows.filter(col("row_idx") > 0)
      .select(col("file") +: col("row_idx") +: dataCols: _*)
  }
}
