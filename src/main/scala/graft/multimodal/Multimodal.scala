package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video travel
  * as opaque `binary` columns + typed metadata, and decode / feature-extract /
  * resize / frame-sample run as partition-batched transforms.
  *
  * The Spark-side plumbing here is real and tested — schemas, the batched
  * mapPartitions seam (the Scala analogue of mapInPandas: the decoder sees an
  * iterator per partition so vectorized native libs amortize setup), and
  * partitioning behavior. The pixel/sample decoding itself is STUBBED with a
  * deterministic md5-derived fake (this container ships no image/audio
  * codecs); swapping in a real codec is implementing one trait method.
  */
object Multimodal {

  /** media table: one row per asset. content is the raw encoded bytes. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 channels: Int, embedding: Array[Float])

  /** Decoder seam. Implementations must be deterministic for replayability
    * (a retried task must produce identical output). */
  trait ImageDecoder extends Serializable {
    /** Batched: one call per partition; amortize codec init across rows. */
    def decodeBatch(batch: Iterator[(Long, Array[Byte])]): Iterator[ImageFeatures]
  }

  /** STUB decoder: derives a fake 8-dim "embedding" and dimensions from the
    * md5 of the bytes. Deterministic, codec-free; NOT a real decode. */
  object FakeImageDecoder extends ImageDecoder {
    def decodeBatch(batch: Iterator[(Long, Array[Byte])]): Iterator[ImageFeatures] = {
      val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
      batch.map { case (id, bytes) =>
        md.reset()
        val h = md.digest(bytes)
        ImageFeatures(id,
          width = 64 + (h(0) & 0x7f), height = 64 + (h(1) & 0x7f), channels = 3,
          embedding = Array.tabulate(8)(i => (h(i) & 0xff) / 255.0f))
      }
    }
  }

  /** Decode seam: binary column -> typed features via the batched decoder.
    * Null/empty content rows are dropped (malformed-asset policy mirrors the
    * reference's skip-on-parse-failure). Runs narrow — no shuffle; at 100 TB
    * the media table is size-partitioned upstream so each task holds a
    * bounded byte volume, not a bounded row count. */
  def decodeImages(media: DataFrame, decoder: ImageDecoder = FakeImageDecoder): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content"))
      .filter(col("content").isNotNull && length(col("content")) > 0)
      .as[(Long, Array[Byte])]
      .mapPartitions(it => decoder.decodeBatch(it))
      .toDF()
  }

  /** Resize on the decoded representation (stub math on fake features —
    * the plumbing point is the schema contract, not the resampling kernel). */
  def resize(features: DataFrame, w: Int, h: Int): DataFrame =
    features.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Frame sampling for video: every nth chunk of the binary payload as a
    * frame row (stub chunking in place of a container demuxer). Generates
    * rows with posexplode — a real demuxer slots into the same shape. */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyNth: Int): DataFrame = {
    require(chunkBytes > 0 && everyNth > 0)
    val nChunks = ceil(length(col("content")).cast("double") / chunkBytes).cast("int")
    // length > 0: sequence(0, greatest(n-1, 0)) would yield [0] for empty
    // payloads and emit a phantom frame
    media.filter(col("modality") === "video" && col("content").isNotNull &&
        length(col("content")) > 0)
      .select(col("media_id"), col("content"), nChunks.as("n"))
      .select(col("media_id"), col("content"),
        posexplode(sequence(lit(0), greatest(col("n") - 1, lit(0)))).as(Seq("pos", "chunk_idx")))
      .filter(pmod(col("chunk_idx"), lit(everyNth)) === 0)
      .select(col("media_id"), col("chunk_idx"),
        expr(s"substring(content, chunk_idx * $chunkBytes + 1, $chunkBytes)").as("frame"))
  }

  /** Audio feature stub: windowed energy over the byte stream (deterministic,
    * codec-free), one row per window — the shape a real DSP pass produces. */
  def audioWindows(media: DataFrame, windowBytes: Int): DataFrame = {
    require(windowBytes > 0)
    val n = ceil(length(col("content")).cast("double") / windowBytes).cast("int")
    media.filter(col("modality") === "audio" && col("content").isNotNull &&
        length(col("content")) > 0)
      .select(col("media_id"), col("content"), n.as("n"))
      .select(col("media_id"), col("content"),
        posexplode(sequence(lit(0), greatest(col("n") - 1, lit(0)))).as(Seq("pos", "win_idx")))
      .select(col("media_id"), col("win_idx"),
        expr(s"crc32(substring(content, win_idx * $windowBytes + 1, $windowBytes))" +
          " / CAST(4294967295 AS DOUBLE)").as("energy"))
  }
}
