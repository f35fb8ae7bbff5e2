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

  // ---- CID/Type0 golden fixture: Identity-H strings + ToUnicode CMap
  // (bfchar singles, bfrange continuous AND array forms, a
  // Flate-compressed CMap stream, and a mid-stream Tf font switch) —
  // the layout production ESG PDFs actually use.

  private val cidCMap =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<0001> <0043>
      |<0002> <0049>
      |endbfchar
      |2 beginbfrange
      |<0010> <0029> <0061>
      |<0030> <0031> [<0044> <0021>]
      |endbfrange
      |endcmap
      |""".stripMargin

  private def buildCidPdf(compressCMap: Boolean): Array[Byte] = {
    // codes: 0001→C, 0002→I, 0010..0029→a..z.., 0030→D, 0031→!
    // "<000100020030>" → "CID"; "<0010 0011 0012>" → "abc"
    val cidText = "<000100020030>" // CID
    val abc     = "<001000110012>" // abc
    val content =
      s"BT /F9 12 Tf 72 720 Td $cidText Tj 0 -14 Td $abc Tj " +
        "0 -14 Td 0 -14 Td /F1 10 Tf (plain simple font tail text) Tj ET"
    val (cmapBytes, cmapFilter) =
      if (compressCMap) (deflate(cidCMap), " /Filter /FlateDecode") else (cidCMap.getBytes(ISO_8859_1), "")
    val cmapStr = new String(cmapBytes, ISO_8859_1)
    val doc =
      "%PDF-1.4\n" +
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
        "3 0 obj << /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F9 5 0 R /F1 7 0 R >> >> /Contents 4 0 R >> endobj\n" +
        s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
        "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /TestCID " +
        "/Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n" +
        s"6 0 obj << /Length ${cmapBytes.length}$cmapFilter >> stream\n$cmapStr\nendstream endobj\n" +
        "7 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n" +
        "%%EOF\n"
    doc.getBytes(ISO_8859_1)
  }

  test("CID/Type0: Identity-H strings decode through the ToUnicode CMap; Tf switches back to simple") {
    for (compressed <- Seq(false, true)) {
      val pages = new SimplePdfExtractor().extractPages("cid", buildCidPdf(compressed))
      assert(pages.length === 1, s"compressed=$compressed")
      assert(pages(0) ===
        "CID\n" +
          "abc\n" +
          "\n" +
          "plain simple font tail text", s"compressed=$compressed")
    }
  }

  test("parseCMap: bfchar, continuous bfrange (last-unit increment) and array bfrange") {
    val cm = SimplePdfExtractor.parseCMap(cidCMap)
    assert(cm(0x0001) === "C" && cm(0x0002) === "I")
    assert(cm(0x0010) === "a" && cm(0x0011) === "b" && cm(0x0029) === "z")
    assert(cm(0x0030) === "D" && cm(0x0031) === "!")
    assert(!cm.contains(0x0032))
  }

  test("dictValue: '/Font' is not confused by longer names like /FontFile earlier in the dict") {
    // A Resources dict whose FIRST '/Font'-prefixed token is a longer
    // name (/FontFile, dangling ref) must not shadow the real /Font
    // table — a plain indexOf would anchor there, fail to parse, and
    // silently drop every CID string on the page.
    val content = "BT /F9 12 Tf 72 720 Td <000100020030> Tj ET" // "CID"
    val cmap    = cidCMap.getBytes(ISO_8859_1)
    val doc =
      ("1 0 obj << /Type /Page " +
        "/Resources << /FontFile 99 0 R /Font << /F9 2 0 R >> >> /Contents 3 0 R >> endobj\n" +
        "2 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 4 0 R >> endobj\n" +
        s"3 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
        s"4 0 obj << /Length ${cmap.length} >> stream\n${new String(cmap, ISO_8859_1)}\nendstream endobj\n")
        .getBytes(ISO_8859_1)
    val pages = new SimplePdfExtractor().extractPages("decoy", doc)
    assert(pages === Seq("CID"))
  }

  test("CID font WITHOUT ToUnicode skips its strings (no mojibake), simple text still extracts") {
    val content = "BT /F9 12 Tf 72 720 Td <00410042> Tj 0 -14 Td /F1 10 Tf (still here) Tj ET"
    val doc =
      ("1 0 obj << /Type /Page /Resources << /Font << /F9 2 0 R >> >> /Contents 3 0 R >> endobj\n" +
        "2 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H >> endobj\n" +
        s"3 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n").getBytes(ISO_8859_1)
    val pages = new SimplePdfExtractor().extractPages("noto", doc)
    assert(pages === Seq("still here"))
  }

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pdf/$name")
    try in.readAllBytes() finally in.close()
  }

  test("standard-security encrypted PDFs decode identically to their plaintext twin") {
    // Golden fixtures generated by scripts/make_encrypted_pdf.py — an
    // INDEPENDENT python implementation of the ISO 32000-1 standard
    // security handler (so a key-derivation bug here can't cancel
    // against itself). Empty user password, owner password set.
    val plain = new SimplePdfExtractor().extractPages("plain", fixture("plain.pdf"))
    assert(plain.length === 2)
    assert(plain(0).startsWith("Encrypted page one body text."))
    assert(plain(1) === "Encrypted page two via flate.")
    for (f <- Seq("rc4_40.pdf", "rc4_128.pdf", "aesv2.pdf", "aes256_r5.pdf", "aes256.pdf")) {
      val pages = new SimplePdfExtractor().extractPages(f, fixture(f))
      assert(pages === plain, s"encrypted $f did not match the plaintext twin")
    }
  }

  test("AES-256: a tampered /U hash fails validation and yields no text, never garbage") {
    // flip one hex nibble inside the stored /U hash (first 32 bytes):
    // the 2.B self-check must refuse the file key
    val raw = new String(fixture("aes256.pdf"), ISO_8859_1)
    val at  = raw.indexOf("/U <")
    val c   = raw.charAt(at + 5)
    val sub = if (c == 'f') 'e' else if (c >= 'a' && c < 'f') (c + 1).toChar
              else if (c == '9') 'a' else (c + 1).toChar
    val bad = raw.substring(0, at + 5) + sub + raw.substring(at + 6)
    assert(new SimplePdfExtractor().extractPages("badu256", bad.getBytes(ISO_8859_1)) === Nil)
  }

  test("object streams expand: page/font dicts packed in an ObjStm resolve, plain and encrypted") {
    // PDF 1.5+ layout from the independent python writer — the page
    // tree lives INSIDE a compressed object stream (what every modern
    // writer emits); the encrypted twin additionally proves the
    // decrypt → inflate → expand ordering.
    for (f <- Seq("objstm.pdf", "objstm_rc4.pdf")) {
      val pages = new SimplePdfExtractor().extractPages(f, fixture(f))
      assert(pages === Seq("Text from an object stream page."), s"fixture $f")
    }
  }

  private def hexStr(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
  private val fixtureId0 = "0123456789abcdef0123456789abcdef"
    .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("encrypt-dict /Length parses top-level only (nested /CF /Length 16 must not shadow it)") {
    // permute the AESV2 dict so the crypt filter's byte-length comes
    // FIRST — a plain findFirst would derive a 5-byte key and lose
    // every stream
    val raw = new String(fixture("aesv2.pdf"), ISO_8859_1)
      .replace("/V 4 /R 4 /Length 128 /CF", "/V 4 /R 4 /CF")
      .replace("/StmF /StdCF /StrF /StdCF /O", "/StmF /StdCF /StrF /StdCF /Length 128 /O")
    val pages = new SimplePdfExtractor().extractPages("permuted", raw.getBytes(ISO_8859_1))
    assert(pages === new SimplePdfExtractor().extractPages("plain", fixture("plain.pdf")))
  }

  test("trailer /ID in literal-string form parses like the hex form") {
    val lit = "(" + new String(fixtureId0, ISO_8859_1) + ")"
    val raw = new String(fixture("rc4_128.pdf"), ISO_8859_1)
      .replace(s"/ID [<$fixtureId0> <$fixtureId0>]", s"/ID [$lit $lit]")
    val pages = new SimplePdfExtractor().extractPages("litid", raw.getBytes(ISO_8859_1))
    assert(pages === new SimplePdfExtractor().extractPages("plain", fixture("plain.pdf")))
  }

  test("V4 /StmF /Identity leaves streams undecrypted (spec: streams not encrypted)") {
    // plaintext body + a V4 Identity-streams encrypt dict with a VALID
    // /U for the fixture /ID: the reader must verify the key, then
    // pass streams through untouched
    val o   = Array.tabulate(32)(_.toByte)
    val p   = -3904
    val key = SimplePdfExtractor.fileKey(o, p, fixtureId0, r = 4, lengthBits = 128,
      encryptMetadata = true)
    val u = SimplePdfExtractor.userEntry(key, fixtureId0, 4) ++ Array.fill[Byte](16)(0)
    val raw = new String(fixture("plain.pdf"), ISO_8859_1).replace("trailer <<",
      s"9 0 obj << /Filter /Standard /V 4 /R 4 /Length 128 " +
        s"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /Identity /StrF /StdCF " +
        s"/O <${hexStr(o)}> /U <${hexStr(u)}> /P $p >> endobj\ntrailer << /Encrypt 9 0 R")
    val pages = new SimplePdfExtractor().extractPages("identity", raw.getBytes(ISO_8859_1))
    assert(pages === new SimplePdfExtractor().extractPages("plain", fixture("plain.pdf")))
  }

  test("literal-string /O containing '<<' bytes does not corrupt encrypt-dict parsing") {
    // 32 printable bytes with '<<' and '>>' planted: a naive depth
    // scanner would treat them as dict delimiters and blank out /U
    // and /P, failing a fully supported file
    val oEntry = "ab<<cd>>ef0123456789abcdefghijkl".getBytes(ISO_8859_1)
    assert(oEntry.length === 32)
    val p   = -3904
    val key = SimplePdfExtractor.fileKey(oEntry, p, fixtureId0, r = 4, lengthBits = 128,
      encryptMetadata = true)
    val u   = SimplePdfExtractor.userEntry(key, fixtureId0, 4) ++ Array.fill[Byte](16)(0)
    val lit = new String(oEntry, ISO_8859_1)
    val raw = new String(fixture("plain.pdf"), ISO_8859_1).replace("trailer <<",
      s"9 0 obj << /Filter /Standard /V 4 /R 4 /Length 128 " +
        s"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /Identity /StrF /StdCF " +
        s"/O ($lit) /U <${hexStr(u)}> /P $p >> endobj\ntrailer << /Encrypt 9 0 R")
    val pages = new SimplePdfExtractor().extractPages("lito", raw.getBytes(ISO_8859_1))
    assert(pages === new SimplePdfExtractor().extractPages("plain", fixture("plain.pdf")))
  }

  test("a /U that does not verify (wrong password) yields no text, never garbage") {
    val raw = new String(fixture("rc4_40.pdf"), ISO_8859_1)
    val at  = raw.indexOf("/U <")
    assert(at > 0)
    val flipped = raw.substring(0, at + 4) +
      raw.substring(at + 4, at + 12).map(c => if (c == 'f') '0' else 'f') +
      raw.substring(at + 12)
    val pages = new SimplePdfExtractor().extractPages("badu", flipped.getBytes(ISO_8859_1))
    assert(pages === Nil)
  }

  test("unsupported encryption handlers yield no text, never garbage") {
    val raw = new String(fixture("rc4_128.pdf"), ISO_8859_1)
    // an unknown future version must be skipped wholesale
    val v6 = raw.replace("/V 2 /R 3", "/V 6 /R 7")
    assert(new SimplePdfExtractor().extractPages("v6", v6.getBytes(ISO_8859_1)) === Nil)
    // a V5 CLAIM over a legacy-shaped dict (32-byte /U, no /UE) must
    // fail the V5 validation path, not fall through to RC4 plaintext
    val v5 = raw.replace("/V 2 /R 3", "/V 5 /R 6")
    assert(new SimplePdfExtractor().extractPages("v5", v5.getBytes(ISO_8859_1)) === Nil)
  }

  test("LZWDecode streams decode (golden fixture from the python encoder)") {
    val pages = new SimplePdfExtractor().extractPages("lzw", fixture("lzw.pdf"))
    assert(pages === Seq(
      "LZW page body text with repeats: the cat the cat the cat sat."))
    // EarlyChange 0 shifts the width rule: must skip, not mis-decode -
    // inline AND via an indirect /DecodeParms reference
    val rawLzw = new String(fixture("lzw.pdf"), ISO_8859_1)
    val ec0 = rawLzw
      .replace("/Filter /LZWDecode", "/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>")
    assert(new SimplePdfExtractor().extractPages("lzw0", ec0.getBytes(ISO_8859_1)) === Nil)
    val ec0i = rawLzw
      .replace("/Filter /LZWDecode", "/Filter /LZWDecode /DecodeParms 9 0 R")
      .replace("trailer <<", "9 0 obj << /EarlyChange 0 >> endobj\ntrailer <<")
    assert(new SimplePdfExtractor().extractPages("lzw0i", ec0i.getBytes(ISO_8859_1)) === Nil)
    // corrupt LZW payload: skip, never partial garbage
    val bytes = fixture("lzw.pdf")
    val at    = new String(bytes, ISO_8859_1).indexOf("stream\n") + 7
    val corrupt = bytes.clone()
    for (i <- at + 4 until math.min(at + 12, corrupt.length)) corrupt(i) = 0x57
    val p2 = new SimplePdfExtractor().extractPages("lzwc", corrupt)
    assert(p2.isEmpty || !p2.exists(_.contains(" ")))
  }

  test("truncated LZW (no EOD) and filter chains skip; indirect /Length falls back to carving") {
    val raw = new String(fixture("lzw.pdf"), ISO_8859_1)
    // truncate the payload mid-stream, keeping markers intact: the
    // decoder must yield nothing, never the decoded prefix
    val at  = raw.indexOf("stream\n") + 7
    val end = raw.indexOf("\nendstream")
    val truncated = raw.substring(0, at + (end - at) / 2) + raw.substring(end)
    assert(new SimplePdfExtractor().extractPages("trunc", truncated.getBytes(ISO_8859_1)) === Nil)
    // a filter CHAIN containing LZWDecode must not decode the raw
    // bytes as bare LZW (classic ASCII85+LZW combination)
    val chained = raw.replace("/Filter /LZWDecode", "/Filter [/ASCII85Decode /LZWDecode]")
    assert(new SimplePdfExtractor().extractPages("chain", chained.getBytes(ISO_8859_1)) === Nil)
    // an INDIRECT /Length ('N 0 R', multi-digit object number) must not
    // backtrack-parse as a short direct length and truncate the stream
    val plain = new String(fixture("plain.pdf"), ISO_8859_1)
    val m = """5 0 obj << /Length (\d+) >>""".r.findFirstMatchIn(plain).get
    val doc = plain.substring(0, m.start) + "5 0 obj << /Length 50 0 R >>" +
      plain.substring(m.end) + s"50 0 obj ${m.group(1)} endobj\n"
    val pages = new SimplePdfExtractor().extractPages("indlen", doc.getBytes(ISO_8859_1))
    assert(pages.nonEmpty && pages(0).startsWith("Encrypted page one body text."))
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
