package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata, with
  * decode / feature-extraction / resize / frame-sampling as distributed
  * per-partition transforms.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernel is a clearly-marked deterministic STUB — the Spark-side
  * contract (schema, partitioning, batch shape, null handling) is real and
  * tested; swapping `stubDecode` for a JNI/FFmpeg/ImageIO call changes no
  * plumbing. Batch-shaped per-partition iteration mirrors how a vectorized
  * decode (e.g. Arrow-batched) would plug in.
  */
object Multimodal {

  /** Canonical multimodal record schema: payload + typed metadata. */
  val mediaSchema: StructType = new StructType()
    .add("media_id", LongType)
    .add("modality", StringType) // image | audio | video
    .add("payload", BinaryType)
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("sample_rate", IntegerType)
    .add("n_frames", IntegerType)

  /** ======== STUB ========
    * Deterministic fake decode: folds payload bytes into `dims` float
    * features (feature j = sum of bytes at positions congruent j mod
    * dims). Integer-valued accumulation — exact in float32 up to 2^24, so
    * the result is bit-identical however it is recomputed (the DuckDB
    * oracle recomputes it in SQL). Replace with a real codec (ImageIO /
    * libsndfile / FFmpeg) behind the same (bytes -> float[]) signature;
    * normalization belongs downstream. */
  def stubDecode(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff).toFloat
      i += 1
    }
    out
  }

  /** Feature extraction: payload -> fixed-size feature vector, one pass
    * per partition (the per-partition iterator is where a real impl would
    * batch rows into a vectorized decoder). Null payloads yield null
    * features, preserved for QC accounting. */
  def extractFeatures(media: DataFrame, dims: Int): DataFrame = {
    val outSchema = media.schema.add("features", ArrayType(FloatType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats = if (payload == null) null else stubDecode(payload, dims)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Frame sampling for video-like payloads: treat the payload as
    * `n_frames` equal slices and keep every `stride`-th slice. Pure
    * byte-slicing (the real impl swaps in a container demuxer); emits one
    * row per kept frame with frame_idx. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val outSchema = new StructType()
      .add("media_id", LongType)
      .add("frame_idx", IntegerType)
      .add("frame_bytes", BinaryType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val nFrames = r.getAs[Int]("n_frames")
        if (payload == null || nFrames <= 0) Iterator.empty
        else {
          val frameLen = math.max(payload.length / nFrames, 1)
          // clamp to frames that actually start inside the payload:
          // with payload shorter than n_frames, offsets past the end
          // would make copyOfRange(from > until) throw.
          val maxFrames = math.min(nFrames, payload.length)
          (0 until maxFrames by stride).iterator.map { f =>
            val from = f * frameLen
            val until = math.min(from + frameLen, payload.length)
            Row(r.getAs[Long]("media_id"), f,
              java.util.Arrays.copyOfRange(payload, from, until))
          }
        }
      }
    }(enc)
  }

  /** Resize stub: deterministic re-bucketing of the stub features to a new
    * dimension — stands in for bilinear resize; contract = (features,
    * newDims) -> features'. */
  def resizeFeatures(features: DataFrame, featCol: String, newDims: Int): DataFrame =
    features.withColumn(featCol,
      expr(s"transform(sequence(0, ${newDims - 1}), " +
        s"i -> element_at($featCol, CAST(i % size($featCol) AS INT) + 1))"))
}
