package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing for the training-data pipeline: media
  * payloads ride as opaque `binary` columns next to a typed metadata
  * struct; decode / feature-extraction runs batch-at-a-time inside
  * `mapPartitions` (the Scala analogue of an Arrow-batched UDF — one
  * decoder instantiation per partition, not per row).
  *
  * The decoder itself is a STUB (this container has no image/audio
  * codecs): `FakeDecoder.decode` derives a deterministic feature from the
  * payload's md5 so the full pipeline — schema, batching, partitioning,
  * output shape — is real and oracle-checked, and a libjpeg/ffmpeg-backed
  * decoder drops into the same seam.
  */
object MultimodalQueries {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            width: Int, height: Int, channels: Int, format: String)
  final case class MediaFeature(doc_id: Long, width: Int, height: Int,
                                channels: Int, format: String, feat: Double)

  /** STUB decoder: a real implementation would decode `payload` with an
    * image codec and pool pixel features. Here: mean of the first 16 hex
    * digits of md5(payload) — deterministic and portable. */
  object FakeDecoder {
    private val hex = "0123456789abcdef"
    def decode(payload: Array[Byte]): Double = {
      val md = MessageDigest.getInstance("MD5")
      val h = md.digest(payload).map("%02x".format(_)).mkString
      h.take(16).map(c => hex.indexOf(c).toDouble).sum / 16.0
    }
  }

  /** m01 — binary payload + metadata struct + batched decode. Payload =
    * the document's UTF-8 bytes standing in for media bytes. */
  def m01_media_features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        (length(col("text")) % 64 + 1).as("width"),
        (graft.functions.KeyAlgebra.ldiv(length(col("text")), lit(64)).cast("int") % 64 + 1).as("height"),
        lit(3).as("channels"), lit("fake8").as("format"))
      .as[MediaRow]
    media.mapPartitions { it =>
      // one decoder per partition — the batch seam a real codec needs
      it.map(r => MediaFeature(r.doc_id, r.width, r.height, r.channels,
        r.format, FakeDecoder.decode(r.payload)))
    }.toDF()
      .orderBy("doc_id")
  }

  final case class FrameSample(doc_id: Long, n_frames: Long,
                               n_sampled: Long, sampled_feat: Double)

  /** m02 — frame sampling: treat the payload as a frame sequence (fixed
    * 64-byte "frames" standing in for decoded video frames), sample every
    * 4th frame, and pool a feature over the sampled frames. The chunk /
    * stride / pool plumbing is what a real video pipeline needs; the
    * per-frame "decode" is the same md5 STUB as m01. */
  def m02_frame_sample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frameBytes = 64
    val stride = 4
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit(0).as("width"), lit(0).as("height"), lit(0).as("channels"),
        lit("frames").as("format"))
      .as[MediaRow]
    media.mapPartitions { it =>
      it.map { r =>
        val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
        val sampled = (0 until nFrames by stride).map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          FakeDecoder.decode(java.util.Arrays.copyOfRange(r.payload, from, until))
        }
        FrameSample(r.doc_id, nFrames.toLong, sampled.size.toLong,
          sampled.sum / sampled.size)
      }
    }.toDF()
      .orderBy("doc_id")
  }

  final case class ResizeSample(doc_id: Long, n_samples: Long,
                                byte_sum: Long, mean_px: Double)

  /** m03 — resize plumbing: treat the payload as a W=32-wide byte grid
    * (H = ceil(len/32) rows) and nearest-neighbor downsample to 8×8 —
    * the index arithmetic of an image resize, with the same byte-level
    * STUB "pixels" as m01/m02 (exact integer sums; a real resampler
    * drops into the same mapPartitions seam). */
  def m03_resize_sample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit(32).as("width"), lit(0).as("height"), lit(1).as("channels"),
        lit("grid8").as("format"))
      .as[MediaRow]
    media.mapPartitions { it =>
      it.map { r =>
        val len = r.payload.length
        val h = (len + 31) / 32
        var sum = 0L
        var k = 0
        while (k < 64) {
          val srcR = (k / 8) * h / 8
          val srcC = (k % 8) * 4
          val idx = math.min(srcR * 32 + srcC, len - 1)
          sum += (r.payload(idx) & 0xff).toLong
          k += 1
        }
        ResizeSample(r.doc_id, 64L, sum, sum / 64.0)
      }
    }.toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_features" -> (m01_media_features _),
    "m02_frame_sample" -> (m02_frame_sample _),
    "m03_resize_sample" -> (m03_resize_sample _),
  )

  val oracles: Map[String, String] = Map(
    "m01_media_features" ->
      """SELECT doc_id,
         (length(text) % 64 + 1)::INT AS width,
         ((length(text) // 64) % 64 + 1)::INT AS height,
         3::INT AS channels, 'fake8' AS format,
         list_reduce(list_transform(range(1, 17),
           i -> (strpos('0123456789abcdef', substr(md5(text), i::INT, 1)) - 1)::DOUBLE),
           (x,y) -> x+y) / 16.0 AS feat
         FROM documents ORDER BY doc_id""",
    "m02_frame_sample" ->
      """SELECT doc_id,
         ((length(text) + 63) // 64)::BIGINT AS n_frames,
         len(range(0, (length(text) + 63) // 64, 4))::BIGINT AS n_sampled,
         list_reduce(list_transform(range(0, (length(text) + 63) // 64, 4), f ->
           list_reduce(list_transform(range(1, 17), i ->
             (strpos('0123456789abcdef',
               substr(md5(substr(text, (f*64 + 1)::INT, 64)), i::INT, 1)) - 1)::DOUBLE),
             (x,y) -> x+y) / 16.0),
           (x,y) -> x+y) /
           len(range(0, (length(text) + 63) // 64, 4))::DOUBLE AS sampled_feat
         FROM documents ORDER BY doc_id""",
    "m03_resize_sample" ->
      """SELECT doc_id, 64::BIGINT AS n_samples,
         CAST(list_reduce(list_transform(range(0, 64), k ->
           ascii(substr(text,
             least((k // 8) * ((length(text) + 31) // 32) // 8 * 32 + (k % 8) * 4,
                   length(text) - 1)::INT + 1, 1))::BIGINT),
           (x,y) -> x+y) AS BIGINT) AS byte_sum,
         list_reduce(list_transform(range(0, 64), k ->
           ascii(substr(text,
             least((k // 8) * ((length(text) + 31) // 32) // 8 * 32 + (k % 8) * 4,
                   length(text) - 1)::INT + 1, 1))::BIGINT),
           (x,y) -> x+y) / 64.0 AS mean_px
         FROM documents ORDER BY doc_id""",
  )
}
