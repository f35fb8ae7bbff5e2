package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by partition-batched
  * decode/feature ops. The IMAGE path is real — [[ImageCodec]] decodes
  * PNG/JPEG via `javax.imageio` (JDK-only), extracts per-channel
  * stats, and resizes actual pixels. The AUDIO path is real —
  * [[WavCodec]] encodes/parses 16-bit PCM mono WAV by walking RIFF
  * chunks (pure `ByteBuffer`, JDK-only) and extracts exact sample
  * statistics. The VIDEO path is real — [[AviCodec]] writes/parses a
  * RIFF-AVI container whose frames are lossless PNG (fourcc MPNG),
  * so frames decode through [[ImageCodec]] bit-exactly. `FakeCodec`
  * remains as the seam a native (ffmpeg-JNI) codec would plug into
  * for formats beyond the JDK-only set.
  *
  * Scale notes: binary payloads ride in the row, so
  * `spark.sql.files.maxPartitionBytes` bounds executor memory per
  * task; decode is mapPartitions (one codec init per task, amortized
  * across the batch) exactly like the Scorer operators.
  */
object Multimodal {

  /** REAL image codec, JDK-only (`javax.imageio` + `BufferedImage`).
    * Deliberately deterministic end to end: PNG encode/decode is
    * lossless for TYPE_INT_RGB, and resize is integer
    * nearest-neighbor (srcX = x·srcW/dstW) rather than Graphics2D
    * filtering, so every output pixel is reproducible arithmetic over
    * input pixels — which is what lets a DuckDB oracle recompute
    * channel statistics of synthetic images exactly
    * (`x_media_decode`).
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Encode an RGB image from a pixel formula (lossless PNG). */
    def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb(x, y) & 0xffffff); x += 1 }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode any ImageIO-supported payload (PNG/JPEG/BMP/GIF);
      * corrupt/unsupported bytes → None (skip, don't fail the job —
      * same contract as the PDF/xlsx sources).
      */
    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      if (bytes == null) None
      else
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }

    /** (width, height, meanR, meanG, meanB) over the full pixel grid;
      * channel sums are exact integers, the means one double division
      * each.
      */
    def stats(img: BufferedImage): (Int, Int, Double, Double, Double) = {
      val w = img.getWidth
      val h = img.getHeight
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff
          sg += (p >> 8) & 0xff
          sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

    /** Integer nearest-neighbor resample to (w, h), re-encoded PNG. */
    def resizePng(img: BufferedImage, w: Int, h: Int): Array[Byte] = {
      val srcW = img.getWidth
      val srcH = img.getHeight
      encodePng(w, h, (x, y) => img.getRGB(x * srcW / w, y * srcH / h))
    }

    /** Perceptual AVERAGE-HASH (aHash) as a 64-char bit STRING —
      * integer-only so every engine replays it exactly: sample an
      * 8×8 nearest-neighbor grid (source pixel at `(i·w/8, j·h/8)`,
      * integer division), luminance = r+g+b (an integer proxy — the
      * usual 0.299/0.587/0.114 weights would drag doubles in for no
      * dedup benefit), bit(k) = 1 iff `64·lum(k) > Σ lums` (the
      * mean compare cross-multiplied into exact integers; equality →
      * 0), emitted row-major (j outer, i inner). A STRING instead of
      * a packed long because bit 63 would wrap a BIGINT's sign and
      * engines disagree on `1<<63` overflow; equality joins neither
      * know nor care.
      */
    def phash(img: BufferedImage): String = {
      val w = img.getWidth
      val h = img.getHeight
      val lums = new Array[Long](64)
      var sum = 0L
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) {
          val p = img.getRGB(i * w / 8, j * h / 8)
          val l = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong
          lums(j * 8 + i) = l
          sum += l
          i += 1
        }
        j += 1
      }
      val sb = new StringBuilder(64)
      var k = 0
      while (k < 64) { sb.append(if (64L * lums(k) > sum) '1' else '0'); k += 1 }
      sb.toString
    }
  }

  /** media table schema: (media_id, kind, bytes, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType)
    )), nullable = true)
  ))

  /** STUB codec — deterministic fake of decode / feature-extraction /
    * resize / frame-sampling. A real implementation swaps these
    * bodies for opencv/ffmpeg calls; signatures and batch shape stay.
    */
  object FakeCodec {
    /** "Decode" → fixed-length feature vector from byte statistics.
      * Accumulates in double, converts to float once at the end —
      * matches an in-order SQL double sum + final float cast exactly.
      */
    def features(bytes: Array[Byte], dims: Int): Array[Float] = {
      val acc = new Array[Double](dims)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) {
          acc(i % dims) += (bytes(i) & 0xff) / 255.0
          i += 1
        }
      }
      acc.map(_.toFloat)
    }

    /** "Resize": crop/pad the payload to w*h bytes. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(if (bytes == null) Array.emptyByteArray else bytes, w * h)

    /** "Frame-sample": every nth chunk of `frameSize` bytes. */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, everyNth: Int): Seq[Array[Byte]] =
      indexedFrames(bytes, frameSize, everyNth).map(_._2)

    /** Same, keeping each frame's original chunk index. */
    def indexedFrames(bytes: Array[Byte], frameSize: Int, everyNth: Int): Seq[(Int, Array[Byte])] = {
      if (bytes == null || frameSize <= 0) return Seq.empty
      bytes.grouped(frameSize).zipWithIndex
        .collect { case (frame, idx) if idx % everyNth == 0 => (idx, frame) }
        .toSeq
    }
  }

  /** Synthesize a deterministic media table from any keyed table —
    * test harness for the plumbing (payload bytes derive from the key).
    */
  def syntheticMedia(df: DataFrame, keyCol: String, payloadLen: Int = 256): DataFrame =
    df.select(col(keyCol).cast("long").as("media_id"))
      .withColumn("kind", element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("media_id"), lit(3)) + 1).cast("int")))
      // payload = the sha2 hex repeated/truncated to payloadLen bytes
      .withColumn("bytes",
        substring(repeat(sha2(col("media_id").cast("string"), 256), payloadLen / 64 + 1),
          1, payloadLen).cast("binary"))
      .withColumn("meta", struct(
        lit(16).as("width"), lit(16).as("height"),
        lit(16000).as("sample_rate"), lit(8).as("n_frames")))

  /** Deterministic synthetic PNG corpus from any keyed table: real
    * encoded images whose pixels follow pure integer arithmetic on
    * (key, x, y) — so an oracle can recompute any decoded statistic
    * without ever seeing the bytes. Dimensions vary per row
    * (8+id%5 × 8+id%7) to keep the plumbing honest about non-uniform
    * payloads. Generation is executor-side (mapPartitions), one
    * encoder per batch.
    */
  def syntheticPngMedia(df: DataFrame, keyCol: String): DataFrame = {
    val keyed = df.select(col(keyCol).cast("long").as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = true),
      StructField("meta", mediaSchema("meta").dataType, nullable = true)))
    keyed.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w  = 8 + (id % 5).toInt
        val h  = 8 + (id % 7).toInt
        val png = ImageCodec.encodePng(w, h, (x, y) => {
          val rr = ((id * 7 + x * 3 + y * 11) % 256).toInt
          val gg = ((id * 13 + x * 5 + y * 2) % 256).toInt
          val bb = ((id * 3 + x * 17 + y * 7) % 256).toInt
          (rr << 16) | (gg << 8) | bb
        })
        Row(id, "image", png, Row(w, h, null, null))
      }
    }(Encoders.row(outSchema))
  }

  /** Partition-batched REAL image decode: adds (img_width, img_height,
    * mean_r, mean_g, mean_b) from the actual decoded pixels;
    * undecodable payloads yield nulls (skip contract). The schema/
    * batching seam is identical to [[extractFeatures]] — this is the
    * FakeCodec seam made real for the image kind.
    */
  def decodeImages(media: DataFrame, chunkSize: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("img_width", IntegerType, nullable = true),
      StructField("img_height", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    val bIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        chunk.iterator.map { r =>
          ImageCodec.decode(r.getAs[Array[Byte]](bIdx)).map(ImageCodec.stats) match {
            // Seq[Any]: a plain Seq(w, h, mr, ...) would unify to
            // Seq[Double] and silently widen the Int dims
            case Some((w, h, mr, mg, mb)) => Row.fromSeq(r.toSeq ++ Seq[Any](w, h, mr, mg, mb))
            case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Partition-batched perceptual-hash extraction: adds `phash` (the
    * [[ImageCodec.phash]] 64-bit aHash string; null for undecodable
    * payloads — skip contract). The CROSS-MODAL dedup primitive: two
    * images with byte-identical perceptual structure collide on
    * `phash` regardless of container bytes, so exact-dedup machinery
    * (hash groupBy, keep-min, cluster fold) applies to images
    * unchanged. Executor-side decode, zero shuffle — the groupBy a
    * caller adds is the only exchange, keyed on a 64-char string.
    */
  def imagePhash(media: DataFrame, chunkSize: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("phash", StringType, nullable = true))
    val bIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        chunk.iterator.map { r =>
          ImageCodec.decode(r.getAs[Array[Byte]](bIdx)).map(ImageCodec.phash) match {
            case Some(p) => Row.fromSeq(r.toSeq :+ p)
            case None    => Row.fromSeq(r.toSeq :+ null)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Partition-batched audio-fingerprint extraction: adds `afp` (the
    * [[WavCodec.fingerprint]] envelope-delta bit string; null for
    * undecodable payloads). The audio leg of cross-modal dedup —
    * exact-dedup machinery applies on the `afp` key like `phash` for
    * images. Executor-side decode, zero shuffle.
    */
  def audioFingerprints(media: DataFrame, chunkSize: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("afp", StringType, nullable = true))
    val bIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        chunk.iterator.map { r =>
          WavCodec.decode(r.getAs[Array[Byte]](bIdx))
            .map { case (_, samples) => WavCodec.fingerprint(samples) } match {
            case Some(f) => Row.fromSeq(r.toSeq :+ f)
            case None    => Row.fromSeq(r.toSeq :+ null)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Partition-batched REAL image resize (nearest-neighbor, PNG out):
    * rewrites `bytes` to the target dimensions and updates the meta
    * struct — [[resizeMedia]]'s image-kind realization. Undecodable
    * payloads pass through unchanged with their original meta.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int, chunkSize: Int = 64): DataFrame = {
    val bIdx = media.schema.fieldIndex("bytes")
    val mIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        chunk.iterator.map { r =>
          ImageCodec.decode(r.getAs[Array[Byte]](bIdx)) match {
            case Some(img) =>
              val resized = ImageCodec.resizePng(img, w, h)
              val meta    = r.getAs[Row](mIdx)
              val newMeta =
                if (meta == null) Row(w, h, null, null)
                else Row(w, h, meta.get(2), meta.get(3))
              Row.fromSeq(r.toSeq.updated(bIdx, resized).updated(mIdx, newMeta))
            case None => r
          }
        }
      }
    }(Encoders.row(media.schema))
  }

  /** Partition-batched resize: rewrites `bytes` to the target
    * dimensions and updates the metadata struct in place — the
    * image-normalization step of a training-data pipeline. Cardinality
    * is preserved; payload size becomes uniform, which is what makes
    * downstream `maxPartitionBytes` sizing predictable.
    */
  def resizeMedia(media: DataFrame, w: Int, h: Int, chunkSize: Int = 64): DataFrame = {
    val bIdx = media.schema.fieldIndex("bytes")
    val mIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        chunk.iterator.map { r =>
          val resized = FakeCodec.resize(r.getAs[Array[Byte]](bIdx), w, h)
          val meta    = r.getAs[Row](mIdx)
          val newMeta =
            if (meta == null) Row(w, h, null, null)
            else Row(w, h, meta.get(2), meta.get(3))
          Row.fromSeq(r.toSeq.updated(bIdx, resized).updated(mIdx, newMeta))
        }
      }
    }(Encoders.row(media.schema))
  }

  /** Partition-batched frame sampling: one output row per kept frame
    * (media_id, kind, frame_idx, frame) — the video→frames explode of
    * a training-data pipeline. Cardinality grows by ~n_frames/everyNth;
    * the explode happens executor-side inside the batch, so no
    * driver involvement and no shuffle.
    */
  def sampleFramesOp(media: DataFrame, frameSize: Int, everyNth: Int, chunkSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = true),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val idIdx = media.schema.fieldIndex("media_id")
    val kIdx  = media.schema.fieldIndex("kind")
    val bIdx  = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        chunk.iterator.flatMap { r =>
          FakeCodec.indexedFrames(r.getAs[Array[Byte]](bIdx), frameSize, everyNth)
            .map { case (idx, frame) =>
              Row(r.getLong(idIdx), r.getString(kIdx), idx, frame)
            }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio codec, JDK-only: canonical 16-bit PCM mono WAV
    * (RIFF/fmt/data) encoded and parsed with plain `ByteBuffer` walks
    * — no media library, no lossy math, so every decoded statistic is
    * exact integer arithmetic an oracle can replay (`x_media_audio`),
    * the same trick [[ImageCodec]] plays with lossless PNG.
    */
  object WavCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Encode 16-bit PCM mono: 44-byte canonical header + LE samples. */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2)            // block align
        .putShort(16)           // bits/sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** Parse a PCM-16 mono WAV by walking RIFF chunks (tolerates extra
      * chunks between fmt and data); anything malformed, compressed,
      * multi-channel or non-16-bit → None (skip contract).
      */
    def decode(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
      if (bytes == null || bytes.length < 44) return None
      try {
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val tag = new Array[Byte](4)
        buf.get(tag)
        if (!java.util.Arrays.equals(tag, "RIFF".getBytes("US-ASCII"))) return None
        buf.getInt // riff size (unchecked: trailing garbage tolerated)
        buf.get(tag)
        if (!java.util.Arrays.equals(tag, "WAVE".getBytes("US-ASCII"))) return None
        var rate    = -1
        var samples: Array[Short] = null
        while (buf.remaining() >= 8 && (rate < 0 || samples == null)) {
          buf.get(tag)
          val size = buf.getInt
          if (size < 0 || size > buf.remaining()) return None
          val name = new String(tag, "US-ASCII")
          if (name == "fmt ") {
            if (size < 16) return None
            val p = buf.position()
            val fmt = buf.getShort; val ch = buf.getShort
            rate = buf.getInt
            buf.getInt; buf.getShort
            val bits = buf.getShort
            if (fmt != 1 || ch != 1 || bits != 16) return None
            // RIFF pads odd-sized chunks to even boundaries; skip the
            // pad byte or the remaining walk misaligns (same discipline
            // as AviCodec.decode).
            buf.position(math.min(p + size + (size % 2), buf.limit()))
          } else if (name == "data") {
            val n   = size / 2
            val arr = new Array[Short](n)
            var i   = 0
            while (i < n) { arr(i) = buf.getShort; i += 1 }
            samples = arr
          } else buf.position(math.min(buf.position() + size + (size % 2), buf.limit()))
        }
        if (rate < 0 || samples == null) None else Some((rate, samples))
      } catch { case _: Exception => None }
    }

    /** Exact integer/double stats: (n, mean, peak |amplitude|, rms).
      * Sums accumulate in Long (|s| ≤ 2¹⁵ ⇒ Σs² < 2³⁰·n, exact far
      * past any real clip length), divisions happen once in double —
      * bit-reproducible by the oracle's BIGINT sums.
      */
    def stats(rate: Int, samples: Array[Short]): (Int, Double, Int, Double) = {
      val n = samples.length
      var sum = 0L; var sumSq = 0L; var peak = 0
      var i = 0
      while (i < n) {
        val v = samples(i).toInt
        sum += v; sumSq += v.toLong * v
        val a = math.abs(v)
        if (a > peak) peak = a
        i += 1
      }
      (n, sum.toDouble / n, peak, math.sqrt(sumSq.toDouble / n))
    }

    /** Envelope-delta FINGERPRINT (chromaprint-lite) as a bit STRING,
      * integer-only: the clip splits into `windows` contiguous
      * windows by `w(t) = t·windows / n` (integer division — the
      * same assignment rule the SQL replay uses, so boundaries can
      * never disagree), window energy = Σ|v|, bit w = 1 iff
      * e(w+1) > e(w) (strict; the rising/falling envelope shape).
      * Amplitude-SCALE invariant by construction (energies scale
      * together, comparisons survive) — the audio analog of
      * [[ImageCodec.phash]]'s resize invariance, and the property a
      * re-encoded / gain-normalized copy needs to still collide.
      */
    def fingerprint(samples: Array[Short], windows: Int = 32): String = {
      val n = samples.length
      if (n == 0) return ""
      val e = new Array[Long](windows)
      var t = 0
      while (t < n) {
        // LONG window math: t*windows in Int overflows past
        // Int.MaxValue/windows samples (~25 min of 44.1 kHz at the
        // default 32 windows) — negative index territory
        e(math.min(windows - 1, (t.toLong * windows / n).toInt)) += math.abs(samples(t).toInt).toLong
        t += 1
      }
      val sb = new StringBuilder(windows - 1)
      var w = 0
      while (w < windows - 1) { sb.append(if (e(w + 1) > e(w)) '1' else '0'); w += 1 }
      sb.toString
    }
  }

  /** REAL video container codec, JDK-only: a minimal RIFF-AVI writer/
    * parser (LIST hdrl with avih/strl headers, LIST movi with 00dc
    * frame chunks, even-byte padding) carrying PNG-encoded frames
    * (fourcc MPNG — PNG-in-AVI, lossless, so frame pixels decode
    * through the real [[ImageCodec]] bit-exactly). The container walk
    * is the same chunk discipline as [[WavCodec]]; together they make
    * all three modalities real: image (PNG), audio (WAV), video
    * (AVI of PNG frames).
    */
  object AviCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    /** Encode an AVI with the given pre-encoded PNG frames. */
    def encodeAvi(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
        val pad = body.length % 2
        val b = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
        b.put(fourcc(tag)).putInt(body.length).put(body)
        b.array()
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", fourcc(kind) ++ body)

      val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      avih.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
        .putInt(frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(width).putInt(height)
      val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      strh.put(fourcc("vids")).put(fourcc("MPNG"))
        .putInt(0).putInt(0).putInt(0)
        .putInt(1).putInt(fps) // scale, rate
        .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      strf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .put(fourcc("MPNG")).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      val hdrl = list("hdrl",
        chunk("avih", avih.array()) ++ list("strl",
          chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
      val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      val riffBody = fourcc("AVI ") ++ hdrl ++ movi
      val out = ByteBuffer.allocate(8 + riffBody.length).order(ByteOrder.LITTLE_ENDIAN)
      out.put(fourcc("RIFF")).putInt(riffBody.length).put(riffBody)
      out.array()
    }

    /** Parse: (width, height, fps, frame payloads); malformed → None.
      * Walks top-level chunks for LIST hdrl (avih dims) and LIST movi
      * (00dc/00db frames), honoring even-byte padding.
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Seq[Array[Byte]])] = {
      if (bytes == null || bytes.length < 24) return None
      try {
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val tag = new Array[Byte](4)
        buf.get(tag)
        if (!java.util.Arrays.equals(tag, fourcc("RIFF"))) return None
        buf.getInt
        buf.get(tag)
        if (!java.util.Arrays.equals(tag, fourcc("AVI "))) return None
        var w = -1; var h = -1; var fps = -1
        val frames = Seq.newBuilder[Array[Byte]]
        while (buf.remaining() >= 8) {
          buf.get(tag)
          val size = buf.getInt
          if (size < 0 || size > buf.remaining()) return None
          val end = buf.position() + size + (size % 2)
          if (java.util.Arrays.equals(tag, fourcc("LIST"))) {
            buf.get(tag)
            if (java.util.Arrays.equals(tag, fourcc("hdrl"))) {
              // scan hdrl sub-chunks for avih (dims + frame interval)
              val hEnd = end
              while (buf.position() + 8 <= hEnd) {
                buf.get(tag)
                val s2 = buf.getInt
                if (s2 < 0 || buf.position() + s2 > hEnd) return None
                if (java.util.Arrays.equals(tag, fourcc("avih")) && s2 >= 40) {
                  val p = buf.position()
                  val usPerFrame = buf.getInt
                  fps = if (usPerFrame > 0) 1000000 / usPerFrame else -1
                  buf.position(p + 28); buf.getInt // skip to width slot
                  w = buf.getInt; h = buf.getInt
                  buf.position(p + s2 + (s2 % 2))
                } else if (java.util.Arrays.equals(tag, fourcc("LIST"))) {
                  buf.get(tag) // descend trivially by skipping the kind
                } else buf.position(buf.position() + s2 + (s2 % 2))
              }
              buf.position(hEnd)
            } else if (java.util.Arrays.equals(tag, fourcc("movi"))) {
              while (buf.position() + 8 <= end) {
                buf.get(tag)
                val s2 = buf.getInt
                if (s2 < 0 || buf.position() + s2 > end) return None
                val name = new String(tag, "US-ASCII")
                if (name == "00dc" || name == "00db") {
                  val payload = new Array[Byte](s2)
                  buf.get(payload)
                  frames += payload
                  if (s2 % 2 == 1) buf.get()
                } else buf.position(buf.position() + s2 + (s2 % 2))
              }
              buf.position(end)
            } else buf.position(end)
          } else buf.position(end)
        }
        val fs = frames.result()
        if (w <= 0 || h <= 0 || fs.isEmpty) None else Some((w, h, fps, fs))
      } catch { case _: Exception => None }
    }
  }

  /** Deterministic synthetic WAV corpus: one clip per input row,
    * samples follow pure integer arithmetic on (key, t) and length/
    * rate vary per row — the audio twin of [[syntheticPngMedia]], so
    * the `x_media_audio` oracle recomputes decoded stats from the
    * formula without seeing a byte.
    */
  def syntheticWavMedia(df: DataFrame, keyCol: String): DataFrame = {
    val keyed = df.select(col(keyCol).cast("long").as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = true),
      StructField("meta", mediaSchema("meta").dataType, nullable = true)))
    keyed.mapPartitions { rows =>
      rows.map { r =>
        val id   = r.getLong(0)
        val n    = (200 + (id % 7) * 50).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val samples = Array.tabulate(n)(t => (((id * 131 + t * 17) % 2003) - 1001).toShort)
        Row(id, "audio", WavCodec.encodeWav(rate, samples), Row(null, null, rate, n))
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic synthetic AVI corpus: one clip per row, PNG frames
    * whose pixels follow integer arithmetic on (key, frame, x, y) —
    * the video twin of [[syntheticPngMedia]]/[[syntheticWavMedia]].
    */
  def syntheticAviMedia(df: DataFrame, keyCol: String): DataFrame = {
    val keyed = df.select(col(keyCol).cast("long").as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = true),
      StructField("meta", mediaSchema("meta").dataType, nullable = true)))
    keyed.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w  = 6 + (id % 3).toInt
        val h  = 6 + (id % 4).toInt
        val n  = 3 + (id % 3).toInt
        val frames = (0 until n).map { f =>
          ImageCodec.encodePng(w, h, (x, y) => {
            val rr = ((id * 7 + f * 29 + x * 3 + y * 11) % 256).toInt
            val gg = ((id * 13 + f * 19 + x * 5 + y * 2) % 256).toInt
            val bb = ((id * 3 + f * 23 + x * 17 + y * 7) % 256).toInt
            (rr << 16) | (gg << 8) | bb
          })
        }
        Row(id, "video", AviCodec.encodeAvi(w, h, fps = 10, frames), Row(w, h, null, n))
      }
    }(Encoders.row(outSchema))
  }

  /** Partition-batched REAL video decode: container walk → one row
    * per frame with the frame's decoded dimensions and channel means
    * (PNG frames decode through [[ImageCodec]] bit-exactly).
    * Undecodable containers are skipped entirely; undecodable single
    * frames yield null stats (both contracts spec'd).
    */
  def decodeVideoFrames(media: DataFrame, chunkSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_w", IntegerType, nullable = true),
      StructField("frame_h", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    val bIdx = media.schema.fieldIndex("bytes")
    val iIdx = media.schema.fieldIndex("media_id")
    media.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        chunk.iterator.flatMap { r =>
          AviCodec.decode(r.getAs[Array[Byte]](bIdx)) match {
            case Some((_, _, _, frames)) =>
              frames.zipWithIndex.iterator.map { case (png, i) =>
                ImageCodec.decode(png).map(ImageCodec.stats) match {
                  case Some((fw, fh, mr, mg, mb)) =>
                    Row.fromSeq(Seq[Any](r.getLong(iIdx), i, fw, fh, mr, mg, mb))
                  case None =>
                    Row.fromSeq(Seq[Any](r.getLong(iIdx), i, null, null, null, null, null))
                }
              }
            case None => Iterator.empty
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Partition-batched REAL audio decode: adds (sample_rate,
    * n_samples, mean_amp, peak_amp, rms_amp) from the actual parsed
    * PCM samples; undecodable payloads yield nulls. The audio-kind
    * realization of the FakeCodec seam, batch shape identical to
    * [[decodeImages]].
    */
  def decodeAudio(media: DataFrame, chunkSize: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_samples", IntegerType, nullable = true),
      StructField("mean_amp", DoubleType, nullable = true),
      StructField("peak_amp", IntegerType, nullable = true),
      StructField("rms_amp", DoubleType, nullable = true)))
    val bIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        chunk.iterator.map { r =>
          WavCodec.decode(r.getAs[Array[Byte]](bIdx)) match {
            case Some((rate, samples)) if samples.nonEmpty =>
              val (n, mean, peak, rms) = WavCodec.stats(rate, samples)
              Row.fromSeq(r.toSeq ++ Seq[Any](rate, n, mean, peak, rms))
            case _ => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Partition-batched feature extraction: adds `features
    * array<float>` via the stub codec. Real schema, real batching —
    * fake math.
    */
  def extractFeatures(media: DataFrame, dims: Int = 8, chunkSize: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val bIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        // one codec "session" per chunk — the amortization point
        chunk.iterator.map { r =>
          val feats = FakeCodec.features(r.getAs[Array[Byte]](bIdx), dims)
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }
}
