package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{AviCodec, ImageCodec}

/** RIFF-AVI container codec: round-trip, odd-size chunk padding,
  * corrupt-skip, and the exploded frame-decode op.
  */
class AviCodecSpec extends SparkSpecBase {

  private def frame(seed: Int): Array[Byte] =
    ImageCodec.encodePng(4, 3, (x, y) => (seed * 31 + x * 7 + y * 13) & 0xffffff)

  test("encode → decode round-trips dims, fps and every frame payload") {
    val frames = (0 until 4).map(frame)
    val avi = AviCodec.encodeAvi(4, 3, fps = 10, frames)
    val Some((w, h, fps, out)) = AviCodec.decode(avi)
    assert((w, h, fps) == ((4, 3, 10)))
    assert(out.size == 4)
    out.zip(frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("odd-sized frame chunks pad to even and still round-trip") {
    // raw byte payloads with odd lengths exercise the padding rule
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6, 7, 8, 9))
    val avi = AviCodec.encodeAvi(2, 2, fps = 5, frames)
    val Some((_, _, _, out)) = AviCodec.decode(avi)
    assert(out.map(_.toSeq) == frames.map(_.toSeq))
  }

  test("corrupt containers skip (None), never throw") {
    assert(AviCodec.decode(null).isEmpty)
    assert(AviCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(AviCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII") ++ new Array[Byte](20)).isEmpty)
    // truncated mid-movi
    val ok = AviCodec.encodeAvi(4, 3, 10, (0 until 3).map(frame))
    assert(AviCodec.decode(ok.dropRight(7)).isEmpty)
  }

  test("decodeVideoFrames explodes per frame with exact decoded stats") {
    import org.apache.spark.sql.functions.col
    val media = Multimodal.syntheticAviMedia(
      GraftSession.table(spark, sf, "nation"), "n_nationkey")
    val out = Multimodal.decodeVideoFrames(media)
      .orderBy(col("media_id"), col("frame_idx")).collect()
    // nation has 25 rows; frames per id = 3 + id % 3
    val expectedRows = (0L until 25L).map(id => 3 + (id % 3)).sum
    assert(out.length == expectedRows)
    // spot-check one frame against the pixel formula
    val r0 = out.find(r => r.getLong(0) == 2L && r.getInt(1) == 1).get
    val (w, h) = (6 + 2 % 3, 6 + 2 % 4) // 8 x 8
    assert(r0.getInt(2) == w && r0.getInt(3) == h)
    val meanR = (for (x <- 0 until w; y <- 0 until h)
      yield ((2 * 7 + 1 * 29 + x * 3 + y * 11) % 256).toDouble).sum / (w * h)
    assert(math.abs(r0.getDouble(4) - meanR) < 1e-12)
  }
}
