package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.WavCodec

import org.apache.spark.sql.functions._

/** REAL audio codec: byte-exact round-trip, RIFF chunk-walk
  * robustness, corrupt-skip contract, and the decode query plumbing.
  */
class WavCodecSpec extends SparkSpecBase {

  private val samples = Array.tabulate(300)(t => ((t * 37) % 2003 - 1001).toShort)

  test("encode → decode round-trips samples and rate bit-exactly") {
    val bytes = WavCodec.encodeWav(16000, samples)
    val Some((rate, out)) = WavCodec.decode(bytes)
    assert(rate == 16000)
    assert(out.toSeq == samples.toSeq)
  }

  test("decode tolerates extra RIFF chunks between fmt and data") {
    val canonical = WavCodec.encodeWav(8000, samples)
    // splice a 12-byte LIST chunk after the fmt chunk (offset 36)
    val extra = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
      .array()
    val spliced = canonical.take(36) ++ extra ++ canonical.drop(36)
    // fix the RIFF size field (bytes 4..7)
    val riffSize = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte
    val Some((rate, out)) = WavCodec.decode(spliced)
    assert(rate == 8000 && out.toSeq == samples.toSeq)
  }

  test("decode skips ODD-sized extra chunks with the RIFF pad byte") {
    val canonical = WavCodec.encodeWav(8000, samples)
    // splice a 5-byte LIST INFO-ish chunk (odd size → 1 pad byte) after fmt
    val extra = java.nio.ByteBuffer.allocate(8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII")).put(0.toByte)
      .array()
    val spliced = canonical.take(36) ++ extra ++ canonical.drop(36)
    val riffSize = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte
    val Some((rate, out)) = WavCodec.decode(spliced)
    assert(rate == 8000 && out.toSeq == samples.toSeq)
  }

  test("corrupt / non-PCM payloads skip (None), never throw") {
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVEjunk".getBytes("US-ASCII") ++ new Array[Byte](40)).isEmpty)
    // stereo (channels=2) must be rejected, not mis-parsed
    val stereo = WavCodec.encodeWav(8000, samples)
    stereo(22) = 2
    assert(WavCodec.decode(stereo).isEmpty)
    // truncated data chunk
    val truncated = WavCodec.encodeWav(8000, samples).dropRight(17)
    assert(WavCodec.decode(truncated).isEmpty)
  }

  test("stats match direct computation") {
    val (n, mean, peak, rms) = WavCodec.stats(8000, samples)
    val ints = samples.map(_.toInt)
    assert(n == 300)
    assert(mean == ints.map(_.toLong).sum.toDouble / 300)
    assert(peak == ints.map(math.abs).max)
    assert(rms == math.sqrt(ints.map(v => v.toLong * v).sum.toDouble / 300))
  }

  test("decodeAudio skips corrupt rows with nulls, decodes the rest") {
    import spark.implicits._
    val good = WavCodec.encodeWav(8000, samples)
    val media = Seq(
      (0L, "audio", good),
      (1L, "audio", Array[Byte](9, 9, 9))
    ).toDF("media_id", "kind", "bytes")
    val out = Multimodal.decodeAudio(media)
      .select("media_id", "n_samples").collect().sortBy(_.getLong(0))
    assert(out(0).getInt(1) == 300)
    assert(out(1).isNullAt(1))
  }
}
