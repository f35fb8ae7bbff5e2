package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by partition-batched
  * decode/feature ops. The Spark-side contract — schema, batch shape,
  * partition sizing — is real; the codec itself is STUBBED (this
  * container has no image/audio libs) behind `FakeCodec`, a
  * deterministic stand-in with the same signature an opencv/ffmpeg
  * JNI codec would have.
  *
  * Scale notes: binary payloads ride in the row, so
  * `spark.sql.files.maxPartitionBytes` bounds executor memory per
  * task; decode is mapPartitions (one codec init per task, amortized
  * across the batch) exactly like the Scorer operators.
  */
object Multimodal {

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
