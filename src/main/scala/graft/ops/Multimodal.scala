package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs per-partition in batches.
  *
  * Two codec families:
  *
  *   - IMAGE (PNG/JPEG/BMP/GIF — anything with a JDK `ImageIO` plugin):
  *     [[decodeImage]] and [[resizeImage]] are REAL decoders — they parse
  *     the container, recover pixel dimensions, and fold per-channel
  *     pixel sums, all with `javax.imageio` + `java.awt.image` (in every
  *     JDK; zero external dependencies). [[synthPng]] writes real PNG
  *     bytes from a deterministic raster so tests and oracles can pin
  *     exact expected dimensions and channel sums.
  *   - OPAQUE (audio/video/unknown — no codec in a stock JVM):
  *     [[opaqueFeatures]] / [[resizeBytes]] / [[frameSample]] operate on
  *     the raw byte payload with deterministic byte-window arithmetic.
  *     On a real cluster a native demuxer slots into the same
  *     mapPartitions seam; the Spark plan is unchanged.
  *
  * Every operator here is map-only over the media table: no shuffle, no
  * state, decode cost parallelizes with input splits — at 100 TB the
  * scan is the only cost, and the heavy `bytes` column is pruned by
  * every query that doesn't decode.
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

  /** Deterministic raster for doc `id`: width `4 + id%13`, height
    * `3 + id%11`, pixel (x,y) = ((id+x)%256, (id+y)%256, (id+x+y)%256).
    * Closed-form in `id`, so a SQL oracle can recompute the expected
    * dimensions and channel sums without decoding anything — and PNG is
    * lossless, so a correct decoder must recover these values exactly. */
  private[graft] def synthRaster(id: Long): java.awt.image.BufferedImage = {
    val w = (4 + id % 13).toInt
    val h = (3 + id % 11).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + x) % 256).toInt
        val g = ((id + y) % 256).toInt
        val b = ((id + x + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Synthesize a real PNG per document (deterministic [[synthRaster]]
    * encoded with the JDK PNG writer). Reads ONLY doc_id — the text
    * column is pruned from the scan. `idMod` > 0 derives the raster
    * from `doc_id % idMod` (media_id stays doc_id): a corpus with
    * repeated images, the dedup fixtures' shape. */
  def synthPng(spark: SparkSession, docs: DataFrame, idMod: Long = 0L): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val rasterId = if (idMod > 0) id % idMod else id
          // MemoryCacheImageOutputStream, NOT the bare OutputStream form:
          // ImageIO.write(_, _, OutputStream) wraps it via
          // createImageOutputStream, which with the default useCache=true
          // allocates a disk-backed FileCacheImageOutputStream per row —
          // the per-row temp-file spill the readImage path avoids
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          try javax.imageio.ImageIO.write(synthRaster(rasterId), "png", ios)
          finally ios.close()
          val bytes = bos.toByteArray
          (id, bytes, "image/png", bytes.length.toLong, "synth")
        }
      }
      .toDF("media_id", "bytes", "format", "n_bytes", "source")
      .select(col("media_id"), col("bytes"),
        struct(col("format"), col("n_bytes"), col("source")).as("meta"))
  }

  case class PHash(media_id: Long, phash: String)

  /** Perceptual hash (aHash family): REAL decode → 8×8 nearest-neighbor
    * downsample (the [[resizeImage]] convention) → integer grayscale
    * `(r+g+b)/3` → threshold each cell at the image mean → 64-bit
    * signature, emitted as a 64-char bit string (a signed long would
    * put bit 63 in the sign — the string form is portable to any SQL
    * engine with no overflow corner). Identical images hash
    * identically; near-identical ones differ in few bits, so the
    * signature slots into the same hamming band-blocking machinery as
    * [[Dedup.simhash64]] for cross-corpus image dedup. Map-only: one
    * decode + 64 pixel reads per row, no shuffle. */
  def aHash64(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (_, img) = readImage(id, bytes)
          val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
          val gray = Array.tabulate(64) { i =>
            val rgb = img.getRGB(((i % 8) * w / 8).toInt, ((i / 8) * h / 8).toInt)
            (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          }
          val mean = gray.sum / 64.0
          PHash(id, gray.map(g => if (g > mean) '1' else '0').mkString)
        }
      }.toDF()
  }

  case class ImageFeature(media_id: Long, format: String, width: Int,
      height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image decode: `ImageIO` parses the container (any format with
    * a JDK plugin — PNG/JPEG/BMP/GIF), yielding true pixel dimensions
    * and per-channel pixel sums. Per-partition batched; one reader
    * resolve per row, no shuffle. Throws on bytes no JDK codec accepts —
    * route unknown formats to [[opaqueFeatures]] instead. */
  def decodeImage(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (fmt, img) = readImage(id, bytes)
          val (sr, sg, sb) = channelSums(img, img.getWidth, img.getHeight,
            (x, _) => x, (_, y) => y)
          ImageFeature(id, fmt, img.getWidth, img.getHeight, sr, sg, sb)
        }
      }.toDF()
  }

  case class ImageResized(media_id: Long, out_w: Int, out_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL pixel-space resize: decode with `ImageIO`, nearest-neighbor
    * resample to (outW, outH) — source pixel of output (x',y') is
    * (x'·w/outW, y'·h/outH) with floor division, the same convention as
    * [[resizeBytes]] — then fold per-channel sums of the resampled
    * raster. */
  def resizeImage(spark: SparkSession, media: DataFrame, outW: Int = 8,
      outH: Int = 6): DataFrame = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (_, img) = readImage(id, bytes)
          val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
          val (sr, sg, sb) = channelSums(img, outW, outH,
            (xp, _) => ((xp * w) / outW).toInt,
            (_, yp) => ((yp * h) / outH).toInt)
          ImageResized(id, outW, outH, sr, sg, sb)
        }
      }.toDF()
  }

  private def readImage(id: Long,
      bytes: Array[Byte]): (String, java.awt.image.BufferedImage) = {
    // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
    // the factory's default disk cache would spill every in-memory
    // payload to a temp file per row on the executor hot path. The
    // no-codec require sits INSIDE the try so a rejected payload never
    // leaks the stream.
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"media $id: no JDK image codec for payload")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        (reader.getFormatName.toLowerCase, reader.read(0))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Fold (sum_r, sum_g, sum_b) over an (outW × outH) grid, sampling the
    * source pixel chosen by (sx, sy). */
  private def channelSums(img: java.awt.image.BufferedImage, outW: Int,
      outH: Int, sx: (Int, Int) => Int, sy: (Int, Int) => Int): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < outH) {
      var x = 0
      while (x < outW) {
        val rgb = img.getRGB(sx(x, y), sy(x, y))
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** Image near-dup PAIRS over [[aHash64]] signatures — the scale path
    * (the exact-group form is a plain hash agg on `phash`). The 64-char
    * bit string packs into one signed long (four 16-bit `conv` pieces
    * OR'd into place — bit-bijective, so hamming on the packed long
    * equals hamming on the string) and the pair machinery DELEGATES to
    * [[Dedup.simhashPairs]]: the pigeonhole band blocking, (band,
    * slice) equi-join, and xor/bit_count verification live in exactly
    * one place for text and image signatures alike. Exactness contract
    * unchanged: band-blocked output ≡ the full quadratic filter for
    * maxDist ≤ 3 (enforced by simhashPairs' maxHamming < bands). */
  /** The 64-char bit string packed to one long (16-bit limbs via conv —
    * conv's 64-bit parse is signed-overflow-prone only past 63 bits, so
    * pack in quarters). Shared by the pair and cluster queries. */
  def packPhash(phash: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 4).map(i =>
      shiftleft(conv(substring(phash, i * 16 + 1, 16), 2, 10)
        .cast("long"), i * 16)).reduce(_ bitwiseOR _)

  def phashNearDup(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    Dedup.simhashPairs(hashes.withColumn("_sim", packPhash(col("phash"))),
      "_sim", "media_id", maxHamming = maxDist, bands = 4)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("dist"))
  }

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

  /** Byte-space resize for OPAQUE payloads — deterministic
    * nearest-neighbor downsample of the byte payload to at most `target`
    * bytes (out[i] = in[i·len/outLen]); for formats with a pixel codec
    * use [[resizeImage]]. Empty payloads are dropped (nothing to
    * resize). */
  def resizeBytes(spark: SparkSession, media: DataFrame, target: Int = 64): DataFrame = {
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

  /** Per-partition batched feature fold for OPAQUE payloads (no JDK
    * codec: audio/video) — deterministic pseudo features (frame count
    * from a 32-byte stride, a digest of the first sampled frame, fake
    * dimensions from the byte length) so tests can assert exact values.
    * A native demuxer slots into this same seam on a real cluster; for
    * images, [[decodeImage]] is already the real thing. */
  def opaqueFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
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

  /** Frame-level EXACT dedup across media: cut every payload into
    * fixed `frameBytes` windows, keep each distinct frame's first
    * occurrence in (media_id, frame index) order, report per-media
    * dup counts — [[Dedup.chunkDedup]]'s keeper algebra applied to the
    * opaque-bytes seam (shared intros/credits/silence across videos
    * are exact byte-window dups long before perceptual hashing enters;
    * at 100 TB this is the cheap first pass that shrinks the payload
    * set the pHash clustering has to touch).
    *
    * Pure Column algebra end to end — the frame explode is
    * `transform` + binary `substr` (codegen'd, no mapPartitions), the
    * keeper min is the same map-side-combined hash agg on the packed
    * (id, pos) long, and nothing but 16-byte digests shuffles. */
  def frameDedup(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "bytes", frameBytes: Int = 32): DataFrame = {
    require(frameBytes >= 1, s"frameBytes must be positive, got $frameBytes")
    val nFrames = ceil(length(col(bytesCol)) / frameBytes.toDouble).cast("int")
    val frameArr = when(length(col(bytesCol)) >= 1,
      transform(sequence(lit(0), nFrames - 1),
        i => col(bytesCol).substr(i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array())
    val frames = media
      .select(col(idCol), posexplode(frameArr).as(Seq("pos", "frame")))
      .select(col(idCol), col("pos"), md5(col("frame")).as("_h"))
      .withColumn("_enc", Dedup.packEnc(idCol))
      .cache()
    val keepers = frames.groupBy("_h").agg(min(col("_enc")).as("_first"))
    val docBase = col("_enc") - col("pos")
    frames.join(keepers, "_h")
      .withColumn("_kept", col("_enc") === col("_first"))
      .withColumn("_cross", col("_first") < docBase ||
        col("_first") >= docBase + (1L << 20))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("_kept"), 0L).otherwise(1L)).as("dup_frames"),
        sum(when(col("_cross"), 1L).otherwise(0L)).as("cross_dup_frames"))
  }
}
