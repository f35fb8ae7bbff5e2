package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Inflater

import scala.collection.mutable
import scala.util.matching.Regex

/** JDK-only PDF text extractor for the "simple PDF" subset: documents
  * with a standard page tree, content streams stored raw or
  * FlateDecode-compressed (`java.util.zip.Inflater`), and text drawn
  * with the standard `BT…ET` operators (`Tj`, `'`, `"`, `TJ`) using
  * simple (byte-per-char, Latin-1-compatible) font encodings — i.e.
  * the output of most programmatic generators. No external codec: the
  * container ships no pdfbox, so this closes the S1 gap the same way
  * [[XlsxSource]] closed S4 (zip+StAX), with a documented subset
  * instead of a stub.
  *
  * Out of scope (falls back to skipping the content, never throwing):
  * encryption, CID/composite fonts, LZW/DCT/CCITT filters,
  * cross-reference streams are not needed (objects are discovered by
  * linear scan, so `XRef` tables are ignored entirely).
  *
  * Reference behavior being replaced:
  * src/components/preprocessing/pdf_text_extractor.py:104-117 (pdf →
  * per-page text via pdf2python/pdfminer); paragraph splitting and the
  * min-alpha filter live downstream in
  * [[PdfSource.readPdfParagraphs]], unchanged.
  *
  * Line model: `Td`/`TD`/`T*`/`'`/`"` each start a new output line, so
  * a generator that moves the cursor twice without drawing produces
  * the blank line (`\n\n`) the downstream paragraph split keys on —
  * the same convention text strippers use.
  */
final class SimplePdfExtractor extends PdfSource.PdfTextExtractor {
  import SimplePdfExtractor._

  def extractPages(fileName: String, bytes: Array[Byte]): Seq[String] = {
    if (bytes == null || bytes.length == 0) return Nil
    try {
      val raw  = new String(bytes, ISO_8859_1)
      val objs = parseObjects(raw)
      val pageRefs = pageContentRefs(objs)
      val byNum = objs.map(o => o.num -> o).toMap
      val pages =
        if (pageRefs.nonEmpty)
          pageRefs.map { refs =>
            refs.flatMap(byNum.get).flatMap(decodedStream)
              .map(extractText).filter(_.nonEmpty).mkString("\n")
          }
        else
          // no page tree (fragment / exotic writer): every text-bearing
          // content stream becomes a page, in file order
          objs.flatMap(decodedStream).filter(_.contains("BT")).map(extractText)
      pages.map(_.trim).filter(_.nonEmpty)
    } catch {
      case scala.util.control.NonFatal(_) => Nil // corrupt file → skip, like the reference
    }
  }
}

object SimplePdfExtractor {

  private case class PdfObj(num: Int, dict: String, stream: Option[Array[Byte]])

  private val ObjStart: Regex    = """(\d+)\s+\d+\s+obj""".r
  private val ContentsOne: Regex = """/Contents\s+(\d+)\s+\d+\s+R""".r
  private val ContentsArr: Regex = """/Contents\s*\[([^\]]*)\]""".r
  private val RefInArr: Regex    = """(\d+)\s+\d+\s+R""".r

  /** Linear object scan (no xref needed): `N G obj … endobj`, with the
    * raw stream payload carved out between `stream`/`endstream`.
    */
  private def parseObjects(raw: String): Vector[PdfObj] = {
    val out = Vector.newBuilder[PdfObj]
    for (m <- ObjStart.findAllMatchIn(raw)) {
      val bodyStart = m.end
      val endObj    = raw.indexOf("endobj", bodyStart)
      if (endObj >= 0) {
        val body      = raw.substring(bodyStart, endObj)
        val streamIdx = body.indexOf("stream")
        if (streamIdx >= 0) {
          val dict = body.substring(0, streamIdx)
          var s    = streamIdx + "stream".length
          if (s < body.length && body.charAt(s) == '\r') s += 1
          if (s < body.length && body.charAt(s) == '\n') s += 1
          val endStream = body.lastIndexOf("endstream")
          if (endStream > s) {
            var e = endStream
            // trailing EOL before endstream is not part of the data
            if (e > s && body.charAt(e - 1) == '\n') e -= 1
            if (e > s && body.charAt(e - 1) == '\r') e -= 1
            out += PdfObj(m.group(1).toInt, dict, Some(body.substring(s, e).getBytes(ISO_8859_1)))
          } else out += PdfObj(m.group(1).toInt, dict, None)
        } else out += PdfObj(m.group(1).toInt, body, None)
      }
    }
    out.result()
  }

  /** `/Type /Page` objects in file order → their content-stream object
    * numbers (single ref or array of refs).
    */
  private def pageContentRefs(objs: Vector[PdfObj]): Vector[Vector[Int]] =
    objs.filter(o => """/Type\s*/Page(?![a-zA-Z])""".r.findFirstIn(o.dict).isDefined)
      .map { o =>
        ContentsArr.findFirstMatchIn(o.dict) match {
          case Some(arr) => RefInArr.findAllMatchIn(arr.group(1)).map(_.group(1).toInt).toVector
          case None      => ContentsOne.findFirstMatchIn(o.dict).map(_.group(1).toInt).toVector
        }
      }
      .filter(_.nonEmpty)

  /** Stream payload, FlateDecode-inflated when the filter says so;
    * unsupported filters yield None (skip, don't throw).
    */
  private def decodedStream(o: PdfObj): Option[String] = o.stream.flatMap { data =>
    if (o.dict.contains("/FlateDecode")) inflate(data).map(b => new String(b, ISO_8859_1))
    else if (o.dict.contains("/Filter")) None
    else Some(new String(data, ISO_8859_1))
  }

  /** Inflate a FlateDecode stream. Truncated/corrupt input yields None
    * (skip the stream — silently-partial text would poison the corpus
    * downstream). `Inflater` holds NATIVE zlib memory: `end()` runs in
    * try/finally so damaged streams in a long-lived executor JVM can't
    * leak it (GC finalization is not prompt enough at corpus scale).
    */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None // truncated input
        if (n > 0) out.write(buf, 0, n)
      }
      if (inf.finished()) Some(out.toByteArray) else None
    } catch { case _: Exception => None }
    finally inf.end()
  }

  /** Walk a content stream: collect shown strings inside `BT…ET`,
    * starting a new line on the cursor-moving text operators and
    * inserting a word gap for large negative `TJ` kerning.
    */
  private[sources] def extractText(content: String): String = {
    val sb       = new mutable.StringBuilder
    var i        = 0
    var inBT     = false
    var arrDepth = 0
    val n        = content.length

    def atWord(w: String): Boolean =
      content.startsWith(w, i) &&
        (i + w.length >= n || !isRegular(content.charAt(i + w.length))) &&
        (i == 0 || !isRegular(content.charAt(i - 1)))

    def newline(): Unit =
      if (sb.nonEmpty && sb.last != '\n') sb += '\n'
      else if (sb.nonEmpty) sb += '\n' // second consecutive move → blank line

    while (i < n) {
      val c = content.charAt(i)
      if (atWord("BT")) { inBT = true; i += 2 }
      else if (atWord("ET")) { inBT = false; newline(); i += 2 }
      else if (inBT && (atWord("Td") || atWord("TD"))) { newline(); i += 2 }
      else if (inBT && atWord("T*")) { newline(); i += 2 }
      else if (inBT && (c == '\'' || c == '"')) { newline(); i += 1 }
      else if (c == '(') {
        val (s, next) = parseLiteralString(content, i)
        if (inBT) sb ++= s
        i = next
      } else if (c == '<' && i + 1 < n && content.charAt(i + 1) != '<') {
        val (s, next) = parseHexString(content, i)
        if (inBT) sb ++= s
        i = next
      } else if (c == '[') { arrDepth += 1; i += 1 }
      else if (c == ']') { arrDepth = math.max(0, arrDepth - 1); i += 1 }
      else if (inBT && arrDepth > 0 && (c == '-')) {
        // TJ kerning: a big negative move is a word gap
        val numEnd = numberEnd(content, i + 1)
        val v      = content.substring(i + 1, numEnd)
        if (v.nonEmpty && v.forall(ch => ch.isDigit || ch == '.') &&
          v.takeWhile(_.isDigit).length >= 3 &&
          (sb.nonEmpty && sb.last != ' ' && sb.last != '\n')) sb += ' '
        i = numEnd
      } else i += 1
    }
    sb.result().trim
  }

  private def isRegular(c: Char): Boolean =
    !c.isWhitespace && "()<>[]{}/%".indexOf(c) < 0

  private def numberEnd(s: String, from: Int): Int = {
    var j = from
    while (j < s.length && (s.charAt(j).isDigit || s.charAt(j) == '.')) j += 1
    j
  }

  /** `(…)` literal string with PDF escapes: \n \r \t \b \f \( \) \\,
    * octal \ddd, escaped-EOL continuation, and balanced nested parens.
    */
  private def parseLiteralString(s: String, open: Int): (String, Int) = {
    val sb    = new mutable.StringBuilder
    var i     = open + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val e = s.charAt(i + 1)
        e match {
          case 'n'  => sb += '\n'; i += 2
          case 'r'  => sb += '\r'; i += 2
          case 't'  => sb += '\t'; i += 2
          case 'b'  => sb += '\b'; i += 2
          case 'f'  => sb += '\f'; i += 2
          case '('  => sb += '('; i += 2
          case ')'  => sb += ')'; i += 2
          case '\\' => sb += '\\'; i += 2
          case '\n' => i += 2
          case '\r' => i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var j   = i + 1
            var oct = 0
            while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              oct = oct * 8 + (s.charAt(j) - '0'); j += 1
            }
            sb += oct.toChar; i = j
          case other => sb += other; i += 2
        }
      } else if (c == '(') { depth += 1; sb += c; i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb += c; i += 1 }
      else { sb += c; i += 1 }
    }
    (sb.result(), i)
  }

  /** `<hex>` string: pairs of hex digits → Latin-1 chars (simple-font
    * byte codes); odd final digit is padded with 0 per spec.
    */
  private def parseHexString(s: String, open: Int): (String, Int) = {
    val close = s.indexOf('>', open + 1)
    if (close < 0) return ("", s.length)
    val hex = s.substring(open + 1, close).filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new mutable.StringBuilder
    var j  = 0
    while (j + 1 < padded.length + 1 && j + 2 <= padded.length) {
      sb += Integer.parseInt(padded.substring(j, j + 2), 16).toChar
      j += 2
    }
    (sb.result(), close + 1)
  }
}
