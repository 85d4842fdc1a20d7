package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-local batch transforms (`mapPartitions`
  * over Rows — the Scala analogue of arrow-batched python UDFs).
  *
  * The actual codec step is STUBBED (media libraries are not available in
  * this environment): [[StubCodec]] produces deterministic fake
  * decodes/features derived from the payload bytes. The Spark-side contract
  * — schema, batch shape, partitioning, null handling — is real and tested;
  * a production codec drops in by replacing StubCodec only.
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

  /** Decode image metadata: adds (width, height, channels). Partition-local,
    * no shuffle; binary payloads never leave the executor. */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = media.schema
      .add("width", IntegerType).add("height", IntegerType).add("channels", IntegerType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(bytesIdx).asInstanceOf[Array[Byte]]
        val (w, h, c) = StubCodec.imageDims(bytes)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c))
      }
    }(enc)
  }

  /** Feature extraction: adds an `embedding: array<float>` column of `dim`
    * dimensions per media row. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = media.schema.add("embedding", ArrayType(FloatType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(bytesIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ StubCodec.features(bytes, dim).toSeq)
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
}
