package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs per-partition in batches.
  *
  * The actual codec is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] produces deterministic fake features.
  * Everything around it — schema, batch shape, partition-parallel
  * execution, column pruning of the heavy binary column — is the real
  * production plumbing and is exercised by tests. On a real cluster the
  * stub body is replaced by the native decoder; the Spark plan is
  * unchanged.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Wrap a text table as a binary media table (the harness has no real
    * media files; the bytes column is the UTF-8 payload, which is enough
    * to exercise the pipeline shape end-to-end). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit("fake/raw").as("format"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  case class MediaFeature(media_id: Long, n_bytes: Long, n_frames: Long,
      frame_digest: String, width: Int, height: Int)

  case class Frame(media_id: Long, frame_idx: Long, frame_digest: String,
      n_bytes: Long)

  /** Frame sampling — the 1→N seam (video → every k-th frame): each media
    * row yields one row per sampled fixed-stride byte window, from the
    * same per-partition iterator a real demuxer would drive. The output
    * is exploded BEFORE any shuffle, so downstream per-frame ops
    * parallelize over frames, not videos — the property that matters
    * when one video is 10 GB. */
  def frameSample(spark: SparkSession, media: DataFrame, stride: Int = 32,
      everyK: Int = 2): DataFrame = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val nFrames = (bytes.length + stride - 1) / stride
          (0 until nFrames by everyK).iterator.map { f =>
            val w = bytes.slice(f * stride, math.min((f + 1) * stride, bytes.length))
            Frame(id, f.toLong, md.digest(w).map("%02x".format(_)).mkString,
              w.length.toLong)
          }
        }
      }.toDF()
  }

  case class Resized(media_id: Long, out_len: Long, digest: String)

  /** Resize stub — deterministic nearest-neighbor downsample of the byte
    * payload to at most `target` bytes (out[i] = in[i·len/outLen]); a
    * real implementation swaps the per-pixel kernel into the same
    * batched seam. Empty payloads are dropped (nothing to resize). */
  def resizeStub(spark: SparkSession, media: DataFrame, target: Int = 64): DataFrame = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val outLen = math.min(target, bytes.length)
          if (outLen == 0) None
          else {
            val out = Array.tabulate(outLen)(i =>
              bytes((i.toLong * bytes.length / outLen).toInt))
            Some(Resized(id, outLen.toLong,
              md.digest(out).map("%02x".format(_)).mkString))
          }
        }
      }.toDF()
  }

  /** Per-partition batched "decode" — the mapPartitions seam where a
    * native decoder would run. The stub derives deterministic pseudo
    * features (frame count from a 32-byte stride, a digest of the first
    * sampled frame, fake dimensions from the byte length) so tests can
    * assert exact values. */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val stride = 32
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val nFrames = (bytes.length + stride - 1) / stride
          val frame0 = bytes.slice(0, math.min(stride, bytes.length))
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(frame0).map("%02x".format(_)).mkString
          MediaFeature(id, bytes.length.toLong, nFrames.toLong, digest,
            width = 16 + (bytes.length % 64), height = 16 + (bytes.length % 48))
        }
      }.toDF()
  }
}
