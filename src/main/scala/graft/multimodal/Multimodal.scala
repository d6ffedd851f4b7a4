package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt extension): media as
  * opaque `binary` + typed metadata struct, with per-partition batch
  * feature extraction.
  *
  * The actual codec work is STUBBED — no image/audio libraries exist
  * in this environment — behind [[FakeDecoder]], a deterministic fake
  * that derives "features" from the bytes. Everything Spark-side is
  * real: schema, partition-parallel execution via `mapPartitions` over
  * a typed Dataset (no driver collect, no Python round-trip), batch
  * shape (one decoder instance per partition, amortized across rows),
  * and a partitioning contract (media tables are bucketed/partitioned
  * by `media_id` so repeated feature passes co-locate).
  */
object Multimodal {

  /** Schema of a media table: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           checksum: Long, feature: Array[Float])

  /** STUB decoder — stands in for a real codec (libjpeg/ffmpeg/…).
    * Deterministic so tests can pin outputs; one instance per
    * partition models per-executor native-lib initialization cost.
    */
  final class FakeDecoder {
    /** "Decode + embed": FNV over bytes → 8 pseudo-features. */
    def decodeAndEmbed(payload: Array[Byte]): (Long, Array[Float]) = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) {
        h ^= (payload(i) & 0xffL); h *= 0x100000001b3L; i += 1
      }
      val f = new Array[Float](8)
      var j = 0
      var x = h
      while (j < 8) {
        x = x * 6364136223846793005L + 1442695040888963407L
        f(j) = ((x >>> 40).toInt / 16777216.0f) - 0.5f
        j += 1
      }
      (h, f)
    }

    /** "Resample": deterministic fold of the source bytes into the
      * w·h·3 buffer a real RGB resampler would produce.
      */
    def resample(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h * 3)
      var i = 0
      while (i < out.length) {
        out(i) = if (payload.length == 0) 0
                 else (payload(i % payload.length) ^ (i >> 8)).toByte
        i += 1
      }
      out
    }
  }

  /** Partition-parallel feature extraction: decoder constructed once
    * per partition (the real-codec pattern), rows streamed through it.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new FakeDecoder // per-partition init, amortized
      rows.map { r =>
        val (sum, feat) = decoder.decodeAndEmbed(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, sum, feat)
      }
    }
  }

  case class MediaFeaturesMd5(media_id: Long, kind: String, n_bytes: Int,
                              checksum: Long, feature: Array[Double])

  /** Same mapPartitions execution shape as [[extractFeatures]], with
    * the stub embed derived from MD5 instead of FNV: MD5 of the same
    * bytes agrees across engines (the q31 device), so the ENTIRE
    * binary-column pipeline — payload bytes, per-partition decoder
    * init, checksum, feature derivation — sits under the driver's
    * cross-engine hash gate (q54), not just a spec. Features are
    * 24-bit hex windows scaled by 2^-24 (exact in double on both
    * engines). The FNV form remains the throughput stub.
    */
  def extractFeaturesMd5(media: Dataset[MediaRow]): Dataset[MediaFeaturesMd5] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init (MessageDigest.digest resets between rows)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val hex = md.digest(r.payload)
          .map(b => f"${b & 0xff}%02x").mkString
        val checksum = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        val feature = Array.tabulate(4) { j =>
          java.lang.Integer.parseInt(hex.substring(6 * j, 6 * j + 6), 16) /
            16777216.0 - 0.5
        }
        MediaFeaturesMd5(r.media_id, r.kind, r.payload.length, checksum,
          feature)
      }
    }
  }

  case class ImageRow(media_id: Long, payload: Array[Byte])

  case class ImageBands(media_id: Long, width: Int, height: Int,
                        bands: Array[Long])

  /** REAL image codec (round-13: retires the md5 stub on the decode
    * path) — javax.imageio, dependency-free in any JVM: PNG/BMP/GIF
    * decode to a BufferedImage and band features read actual pixels.
    * The md5 arm ([[extractFeaturesMd5]]) REMAINS the cross-engine
    * oracle device for the plumbing; this codec is the production
    * decode the reference's quicklook/tilecache path runs with raster
    * tools (eodatadownlandsatgoogsensor.py:1341-1413).
    *
    * One instance per partition (ImageIO scanner lookup amortized),
    * matching the [[FakeDecoder]] execution contract exactly — the
    * surface swap the Multimodal scaladoc promised.
    */
  final class ImageCodec {
    def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "ImageCodec: payload is not a decodable image")
      img
    }

    /** Horizontal-band luminance sums over the DECODED pixels:
      * band b = Σ (r+g+b) over rows [h·b/bands, h·(b+1)/bands).
      * Returned as raw integer sums — exact, so a closed-form oracle
      * over the image GENERATOR can replay them without any codec.
      */
    def bandSums(img: java.awt.image.BufferedImage,
                 bands: Int): Array[Long] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        val y1 = h * (b + 1) / bands
        var y = h * b / bands
        var sum = 0L
        while (y < y1) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        out(b) = sum
        b += 1
      }
      out
    }

    /** Encode a w×h image from a per-row RGB function to PNG bytes —
      * the test/demo generator for the decode path (PNG is lossless,
      * so decode∘encode is the identity on pixels and a closed-form
      * oracle stays exact end-to-end through the REAL codec).
      */
    def encodePngRows(w: Int, h: Int, rowRgb: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val c = rowRgb(y)
        var x = 0
        while (x < w) { img.setRGB(x, y, c); x += 1 }
        y += 1
      }
      encodePng(img)
    }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** REAL aspect-preserving resize into a maxW×maxH box (never
      * upscales): decode → Graphics2D bilinear draw → PNG re-encode.
      * Returns (png bytes, new width, new height) — the production
      * form of [[Multimodal.resize]]'s byte-fold stub, same sizing
      * rule.
      */
    def resizePng(payload: Array[Byte], maxW: Int,
                  maxH: Int): (Array[Byte], Int, Int) = {
      val img = decode(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val scale = math.min(1.0,
        math.min(maxW.toDouble / w, maxH.toDouble / h))
      val (nw, nh) = (math.max(1, (w * scale).toInt),
        math.max(1, (h * scale).toInt))
      if (nw == w && nh == h) return (encodePng(img), w, h)
      val out = new java.awt.image.BufferedImage(
        nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      (encodePng(out), nw, nh)
    }
  }

  /** Partition-parallel REAL decode: payload bytes → ImageIO decode →
    * per-band luminance sums. Same mapPartitions shape as
    * [[extractFeatures]]; the codec construction is per-partition.
    */
  def decodeBandSums(media: Dataset[ImageRow],
                     bands: Int): Dataset[ImageBands] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new ImageCodec
      rows.map { r =>
        val img = codec.decode(r.payload)
        ImageBands(r.media_id, img.getWidth, img.getHeight,
          codec.bandSums(img, bands))
      }
    }
  }

  /** Resize shape for images: payload → payload', meta.width/height
    * rewritten to the target box (aspect-preserving fit). The pixel
    * resample itself is the stub — a deterministic byte fold to the
    * size a real resampler would emit (w·h·3) — but the Spark-side
    * contract is real: per-partition codec init, payload column
    * rewritten in place, metadata struct rebuilt without disturbing
    * the audio/video fields, schema preserved for downstream writers.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.rdd.mapPartitions { rows =>
      val decoder = new FakeDecoder // per-partition init, amortized
      rows.map { r =>
        val meta = r.getStruct(r.fieldIndex("meta"))
        val payload = r.getAs[Array[Byte]]("payload")
        val isImage = r.getString(r.fieldIndex("kind")) == "image" &&
          meta != null && payload != null
        if (!isImage) {
          // non-image rows (and null meta) pass through COMPLETELY
          // undisturbed — fabricating width/height for audio/video
          // would corrupt their metadata contract
          Row(r.getLong(0), r.getString(1), payload, meta)
        } else {
          val (w, h) = (Option(meta.get(0)).fold(maxW)(_.asInstanceOf[Int]),
            Option(meta.get(1)).fold(maxH)(_.asInstanceOf[Int]))
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          Row(r.getLong(0), r.getString(1), decoder.resample(payload, nw, nh),
            Row(nw, nh, meta.get(2), meta.get(3)))
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Frame-sampling shape for video: explode k deterministic offsets
    * per row — the Spark-side contract of a frame sampler (the decode
    * itself is the stub).
    */
  def sampleFrames(media: DataFrame, k: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(transform(sequence(lit(0), lit(k - 1)),
        i => (i * floor(coalesce(col("meta.n_frames"), lit(k)) / k))
          .cast("int"))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_offset")
}
