package graft

import graft.ops.Multimodal.{AviCodec, ImageCodec, WavCodec}
import graft.sources.{SimplePdfExtractor, XlsxSource}

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Seeded mutation fuzz over every binary codec: flip/truncate valid
  * payloads at random positions — decode must return a skip (or a
  * successful parse of a still-valid file), NEVER throw. At 100 TB a
  * corpus always contains corrupt members; a codec that throws kills
  * the task and, after retries, the job.
  */
class CodecFuzzSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(1234)

  private def mutations(valid: Array[Byte], n: Int): Seq[Array[Byte]] =
    (1 to n).map { _ =>
      val m = valid.clone()
      rnd.nextInt(3) match {
        case 0 => // flip a handful of bytes
          (1 to 1 + rnd.nextInt(8)).foreach { _ =>
            m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          }
          m
        case 1 => m.take(rnd.nextInt(m.length)) // truncate
        case 2 => // splice garbage into the middle
          val at = rnd.nextInt(m.length)
          m.take(at) ++ Array.fill(4 + rnd.nextInt(16))(rnd.nextInt(256).toByte) ++ m.drop(at)
      }
    }

  test("WAV codec survives 200 seeded mutations") {
    val valid = WavCodec.encodeWav(8000, Array.tabulate(100)(i => (i * 7).toShort))
    mutations(valid, 200).foreach(b => WavCodec.decode(b)) // must not throw
  }

  test("AVI codec survives 200 seeded mutations") {
    val frames = (0 until 3).map(f =>
      ImageCodec.encodePng(4, 4, (x, y) => (f * 31 + x + y) & 0xffffff))
    val valid = AviCodec.encodeAvi(4, 4, 10, frames)
    mutations(valid, 200).foreach(b => AviCodec.decode(b))
  }

  test("PNG decode survives 200 seeded mutations") {
    val valid = ImageCodec.encodePng(8, 8, (x, y) => (x * 17 + y * 29) & 0xffffff)
    mutations(valid, 200).foreach(b => ImageCodec.decode(b))
  }

  test("simple-PDF extractor survives 200 seeded mutations") {
    // minimal raw-stream one-pager (same shape as the s1 generator)
    val content = "BT /F1 12 Tf 72 720 Td (Hello fuzz world.) Tj 0 -28 Td 0 -28 Td (Second paragraph.) Tj ET"
    val doc =
      "%PDF-1.4\n" +
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
        "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
        s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    val valid = doc.getBytes(ISO_8859_1)
    val codec = new SimplePdfExtractor
    assert(codec.extractPages("fuzz.pdf", valid).nonEmpty)
    mutations(valid, 200).foreach(b => codec.extractPages("fuzz.pdf", b))
  }

  test("xlsx reader survives 200 seeded mutations") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzz-xlsx").toString
    graft.sources.XlsxSource.writeXlsx(
      Seq(("x", 1L), ("y", 2L)).toDF("a", "b").orderBy(col("a")), s"$dir/f.xlsx", "data")
    val valid = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/f.xlsx"))
    assert(XlsxSource.parseWorkbook(valid, "data").nonEmpty)
    mutations(valid, 200).foreach(b => XlsxSource.parseWorkbook(b, "data"))
  }
}
