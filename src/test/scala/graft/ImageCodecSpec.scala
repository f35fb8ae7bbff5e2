package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.ImageCodec

import org.apache.spark.sql.functions._

/** The REAL image path: PNG encode → decode round-trip is lossless,
  * stats are exact, nearest-neighbor resize picks the arithmetic
  * source pixels, and the partition-batched operators carry it all
  * through DataFrames (incl. the corrupt-payload skip contract).
  */
class ImageCodecSpec extends SparkSpecBase {
  import spark.implicits._

  test("golden fixture: 2x2 PNG round-trips pixels and stats exactly") {
    // pixels: (0,0)=red 255, (1,0)=green 128, (0,1)=blue 64, (1,1)=gray 10
    val px = Map((0, 0) -> 0xff0000, (1, 0) -> 0x008000, (0, 1) -> 0x000040, (1, 1) -> 0x0a0a0a)
    val png = ImageCodec.encodePng(2, 2, (x, y) => px((x, y)))
    val img = ImageCodec.decode(png).get
    assert(img.getWidth === 2 && img.getHeight === 2)
    px.foreach { case ((x, y), v) => assert((img.getRGB(x, y) & 0xffffff) === v) }
    val (w, h, mr, mg, mb) = ImageCodec.stats(img)
    assert((w, h) === ((2, 2)))
    assert(mr === (255 + 0 + 0 + 10) / 4.0)
    assert(mg === (0 + 0x80 + 0 + 10) / 4.0)
    assert(mb === (0 + 0 + 0x40 + 10) / 4.0)
  }

  test("nearest-neighbor resize 4x4 -> 2x2 picks source pixels (0,0),(2,0),(0,2),(2,2)") {
    val png = ImageCodec.encodePng(4, 4, (x, y) => (x * 16 + y) << 16) // distinct reds
    val img = ImageCodec.decode(png).get
    val out = ImageCodec.decode(ImageCodec.resizePng(img, 2, 2)).get
    assert(out.getWidth === 2 && out.getHeight === 2)
    assert(((out.getRGB(0, 0) >> 16) & 0xff) === 0)       // src (0,0)
    assert(((out.getRGB(1, 0) >> 16) & 0xff) === 2 * 16)  // src (2,0)
    assert(((out.getRGB(0, 1) >> 16) & 0xff) === 2)       // src (0,2)
    assert(((out.getRGB(1, 1) >> 16) & 0xff) === 2 * 16 + 2)
  }

  test("corrupt bytes decode to None; decodeImages yields null stats rows, not failures") {
    assert(ImageCodec.decode("not a png".getBytes) === None)
    assert(ImageCodec.decode(null) === None)
    val keyed = Seq(1L, 2L).toDF("k")
    val media = Multimodal.syntheticPngMedia(keyed, "k")
      .unionByName(Seq((99L, "image", "junk".getBytes, null))
        .toDF("media_id", "kind", "bytes", "m")
        .select(col("media_id"), col("kind"), col("bytes"),
          lit(null).cast(Multimodal.mediaSchema("meta").dataType).as("meta")))
    val out = Multimodal.decodeImages(media)
    assert(out.count() === 3)
    assert(out.filter(col("img_width").isNull).select(col("media_id")).head().getLong(0) === 99L)
  }

  test("decodeImages stats match the synthetic pixel formula") {
    val media = Multimodal.syntheticPngMedia(Seq(3L).toDF("k"), "k")
    val row = Multimodal.decodeImages(media).head()
    val (w, h) = (8 + 3 % 5, 8 + 3 % 7) // 11 x 11
    assert(row.getAs[Int]("img_width") === w)
    assert(row.getAs[Int]("img_height") === h)
    val expR = (for { x <- 0 until w; y <- 0 until h } yield (3 * 7 + x * 3 + y * 11) % 256)
      .sum.toDouble / (w * h)
    assert(math.abs(row.getAs[Double]("mean_r") - expR) < 1e-12)
  }

  test("resizeImages rewrites bytes to real resized PNGs and updates meta") {
    val media = Multimodal.syntheticPngMedia(Seq(1L, 2L, 3L).toDF("k"), "k")
    val out = Multimodal.resizeImages(media, 6, 5)
    assert(out.count() === 3)
    out.collect().foreach { r =>
      val img = ImageCodec.decode(r.getAs[Array[Byte]]("bytes")).get
      assert(img.getWidth === 6 && img.getHeight === 5)
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getInt(0) === 6 && meta.getInt(1) === 5)
    }
  }
}
