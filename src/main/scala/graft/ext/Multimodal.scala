package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.5): media payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The actual codec step is STUBBED (image/audio libraries are not in this
  * container): [[StubCodec]] produces deterministic fake decodes from the
  * byte payload. Everything around it — schema, encoders, partition-wise
  * batch processing, the operator signatures — is real Spark plumbing: the
  * per-partition iterator shape below is exactly what a JNI/ffmpeg decoder
  * drops into (one codec init per partition, streaming over rows).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaItem(
      media_id: Long, kind: String, payload: Array[Byte],
      source: String, n_bytes: Long)

  /** Decoded media: dimensions/duration extracted by the codec. */
  case class DecodedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, ok: Boolean)

  /** Fixed-size feature vector per media item. */
  case class MediaFeatures(media_id: Long, features: Array[Float])

  /** The pluggable codec boundary: a real decoder (JNI/ffmpeg/PIL-server
    * client) implements these two calls and slots into [[decodeAll]] /
    * [[extractFeatures]] without touching the plan shape — the Spark side
    * (schema, encoders, partition-wise batching) is codec-agnostic.
    * [[init]] runs once per partition before any row is decoded: the place
    * for expensive context setup (native lib load, model weights, socket).
    * Implementations must be Serializable (shipped to executors) and
    * deterministic per payload if their output feeds an oracled query. */
  trait MediaCodec extends Serializable {
    /** Once-per-partition setup hook; default no-op. */
    def init(): Unit = ()
    /** payload → (width, height, n_frames). */
    def decode(payload: Array[Byte]): (Int, Int, Int)
    /** payload → fixed-size feature vector. */
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake codec — replace with a real decoder at deploy time.
    * Reads only payload bytes, so behavior is stable across runs/executors. */
  object StubCodec extends MediaCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (256 + n % 1024, 256 + (n / 7) % 1024, 1 + n % 30)
    }
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      // Integer slot sums of (byte & 0xff): order-free and exactly
      // representable in f32 while a slot sum stays < 2^24 (needs a
      // >1 MB payload per 16-dim slot to break), so an external SQL
      // engine can recompute the vector bit-for-bit from the raw bytes.
      // The previous f32 accumulation was sequential-order-dependent and
      // therefore unverifiable cross-engine.
      val acc = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff).toLong
        i += 1
      }
      val out = new Array[Float](dim)
      i = 0
      while (i < dim) { out(i) = acc(i).toFloat; i += 1 }
      out
    }
  }

  /** Build a media table from any (id, text-ish, source) table — payload is
    * the utf-8 bytes (stand-in for image/audio blobs). */
  def mediaTable(df: DataFrame, idCol: String, payloadCol: String,
      sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").alias("media_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").alias("kind"),
      encode(col(payloadCol), "UTF-8").alias("payload"),
      col(sourceCol).alias("source"),
      octet_length(encode(col(payloadCol), "UTF-8")).cast("long").alias("n_bytes"))

  /** Decode pass: mapPartitions so the codec initializes once per
    * partition (the expensive step at 100 TB), then streams rows. The
    * codec is resolved per partition via [[MediaCodec.init]]. */
  def decodeAll(media: Dataset[MediaItem], codec: MediaCodec = StubCodec)(
      implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      codec.init() // once per partition, not per row
      it.map { m =>
        val (w, h, f) = codec.decode(m.payload)
        DecodedMedia(m.media_id, m.kind, w, h,
          n_frames = if (m.kind == "image") 1 else f, ok = true)
      }
    }
  }

  /** Feature extraction with bounded batch shape (`batch` rows per codec
    * call — mirrors an inference server's max batch size). */
  def extractFeatures(media: Dataset[MediaItem], dim: Int = 16, batch: Int = 64,
      codec: MediaCodec = StubCodec)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      codec.init()
      it.grouped(batch).flatMap { chunk =>
        chunk.map(m => MediaFeatures(m.media_id, codec.features(m.payload, dim)))
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index up to the
    * decoded frame count (metadata-only here; a real impl yields frames). */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Int = 10)(
      implicit spark: SparkSession): DataFrame = {
    decoded.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .alias("frame_idx"))
  }
}
