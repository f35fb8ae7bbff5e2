package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}
import java.util.zip.Deflater

import graft.sources.{PdfSource, SimplePdfExtractor}

/** Golden-bytes contract test for the JDK-only simple-PDF codec: a
  * hand-authored two-page PDF (page 1 raw, page 2 FlateDecode) with
  * literal-string escapes, octal, hex strings, TJ kerning gaps, and
  * double-Td paragraph breaks — then the same bytes end-to-end through
  * the binaryFile → paragraph-table plumbing.
  */
class SimplePdfSpec extends SparkSpecBase {

  private val content1 =
    "BT /F1 12 Tf 72 720 Td (First paragraph line one.) Tj " +
      "0 -14 Td (Line two with \\(escapes\\) and \\\\ backslash plus octal \\101.) Tj " +
      "0 -14 Td 0 -14 Td (Second paragraph after blank line.) Tj " +
      "0 -14 Td [ (kerned) -300 (words) ] TJ " +
      "0 -14 Td <48656C6C6F20686578> Tj ET"

  private val content2 = "BT 72 720 Td (Page two text body here with enough letters.) Tj ET"

  private def deflate(s: String): Array[Byte] = {
    val d   = new Deflater()
    d.setInput(s.getBytes(ISO_8859_1)); d.finish()
    val buf = new Array[Byte](8192)
    val n   = d.deflate(buf)
    d.end()
    buf.take(n)
  }

  private def buildPdf(): Array[Byte] = {
    val flate    = deflate(content2)
    val flateStr = new String(flate, ISO_8859_1)
    val doc =
      "%PDF-1.4\n" +
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
        "2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >> endobj\n" +
        "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n" +
        "4 0 obj << /Type /Page /Parent 2 0 R /Contents [6 0 R] >> endobj\n" +
        s"5 0 obj << /Length ${content1.length} >> stream\n$content1\nendstream endobj\n" +
        s"6 0 obj << /Length ${flate.length} /Filter /FlateDecode >> stream\n$flateStr\nendstream endobj\n" +
        "%%EOF\n"
    doc.getBytes(ISO_8859_1)
  }

  test("extractPages: page tree order, raw + FlateDecode, escapes/hex/TJ/paragraph breaks") {
    val pages = new SimplePdfExtractor().extractPages("fixture", buildPdf())
    assert(pages.length === 2)
    assert(pages(0) ===
      "First paragraph line one.\n" +
        "Line two with (escapes) and \\ backslash plus octal A.\n" +
        "\n" +
        "Second paragraph after blank line.\n" +
        "kerned words\n" +
        "Hello hex")
    assert(pages(1) === "Page two text body here with enough letters.")
  }

  test("corrupt bytes and unsupported filters skip cleanly") {
    val ex = new SimplePdfExtractor()
    assert(ex.extractPages("junk", Array[Byte](1, 2, 3)) === Nil)
    assert(ex.extractPages("empty", Array.emptyByteArray) === Nil)
    val lzw = ("1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n" +
      "2 0 obj << /Filter /LZWDecode >> stream\nxxxx\nendstream endobj\n").getBytes(ISO_8859_1)
    assert(ex.extractPages("lzw", lzw) === Nil)
  }

  test("end-to-end through readPdfParagraphs: real codec, binaryFile plumbing") {
    val dir = Files.createTempDirectory("simple-pdf").toString
    Files.write(Paths.get(dir, "report.pdf"), buildPdf())
    val out = PdfSource.readPdfParagraphs(spark, dir, new SimplePdfExtractor())
      .orderBy("page", "para_idx")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.forall(_._1 == "report"))
    // page 0 splits into two paragraphs at the blank line; page 1 is one
    assert(out.map(t => (t._2, t._3)).toSeq === Seq((0, 0), (0, 1), (1, 0)))
    assert(out(0)._4.contains("First paragraph line one."))
    assert(out(1)._4.contains("Second paragraph after blank line."))
    assert(out(2)._4.contains("Page two text body here"))
  }
}
