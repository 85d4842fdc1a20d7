package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC 1.0 source/sink for Common-Crawl-style page tables — the crawl
  * world's native container format (ISO 28500; the reference engine has no
  * crawl ingestion at all, its loader starts from a Neo4j store:
  * core/src/main/java/org/neo4j/gds/core/loading/GraphStoreFactory.java).
  * This is the format a 100 TB crawl actually arrives in, so the engine
  * reads and writes it directly:
  *
  *  - one `.warc` (or `.warc.gz`) file per partition — Common Crawl ships
  *    ~1 GB files, one Spark task per file is the intended parallelism;
  *  - `.warc.gz` follows the CC convention of one gzip MEMBER per record
  *    (members are concatenated, so a reader can split records without
  *    decompressing the whole file; `GZIPInputStream` reads members
  *    back-to-back transparently);
  *  - `response` records carry the raw html payload, `WARC-Target-URI`,
  *    `WARC-Date` (second-precision ISO-8601, the WARC 1.0 grammar) and
  *    Common Crawl's `WARC-Identified-Content-Language` header;
  *  - record ids are deterministic (`urn:graft:<xxhash64 of url>`) so a
  *    re-export of the same table is byte-identical — the same
  *    reproducibility contract as the rest of the io layer.
  *
  * Write uses the Hadoop FileSystem API (works on local FS, HDFS and object
  * stores alike); each task streams its partition — nothing is buffered
  * beyond one record, so arbitrarily large partitions write in O(1) memory.
  * Read uses the `binaryFile` source (one task per file) and a
  * partition-local splitter that walks `Content-Length` boundaries — no
  * regex over payload bytes, payloads are never copied more than once.
  */
object Warc {

  private val WarcDate = DateTimeFormatter.ISO_INSTANT

  private val readSchema = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = false),
    StructField("lang", StringType, nullable = true)))

  /** Serialize one response record (headers + payload + record separator). */
  private def record(url: String, epochSec: Long, html: Array[Byte],
                     lang: String): Array[Byte] = {
    val id = {
      // deterministic record id from the url (xxhash64 seed 0), not a UUID:
      // re-exports must be byte-identical
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(org.apache.spark.unsafe.types.UTF8String.fromString(url), StringType, 0L)
      f"urn:graft:$h%016x"
    }
    val hdr = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append("WARC-Type: response\r\n")
      .append(s"WARC-Record-ID: <$id>\r\n")
      .append(s"WARC-Date: ${WarcDate.format(Instant.ofEpochSecond(epochSec))}\r\n")
      .append(s"WARC-Target-URI: $url\r\n")
      .append(if (lang != null && lang.nonEmpty) s"WARC-Identified-Content-Language: $lang\r\n" else "")
      .append("Content-Type: text/html\r\n")
      .append(s"Content-Length: ${html.length}\r\n")
      .append("\r\n")
      .toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(hdr.length + html.length + 4)
    out.write(hdr); out.write(html); out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** Write `pages(url, warc_ts, html[, lang])` as WARC files under `dir`,
    * one file per partition. `compress = true` writes the Common-Crawl
    * one-gzip-member-per-record `.warc.gz` form. */
  def write(pages: DataFrame, dir: String, compress: Boolean = true,
            prefix: String = "part"): Unit = {
    val ext = if (compress) ".warc.gz" else ".warc"
    val hasLang = pages.columns.contains("lang")
    val cols = Seq(col("url"), unix_timestamp(col("warc_ts")).as("epoch"), col("html")) ++
      (if (hasLang) Seq(col("lang")) else Seq(lit(null).cast("string").as("lang")))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      pages.sparkSession.sparkContext.hadoopConfiguration)
    pages.select(cols: _*).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val pid  = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(dir, f"$prefix-$pid%05d$ext")
        val fs   = path.getFileSystem(conf.value)
        val out  = fs.create(path, true)
        try rows.foreach { r =>
          val rec = record(r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2),
            r.getString(3))
          if (compress) {
            // one gzip member per record (CC convention): flushing a fresh
            // GZIPOutputStream per record keeps members independent
            val buf = new ByteArrayOutputStream(rec.length / 2 + 64)
            val gz  = new GZIPOutputStream(buf)
            gz.write(rec); gz.finish(); gz.close()
            buf.writeTo(out)
          } else out.write(rec)
        } finally out.close()
      }
    }
  }

  /** Read WARC files under `dir` into `(url, warc_ts, html, lang)` — one
    * task per file (Common Crawl's own parallelism unit). Non-`response`
    * records (warcinfo, request, metadata) are skipped, matching how crawl
    * consumers read CC. */
  def read(spark: SparkSession, dir: String): DataFrame =
    parseFiles(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(dir)
      .select(col("path"), col("content")))

  /** Streaming variant: watch `dir` for new WARC files and emit their
    * response records as an unbounded `(url, warc_ts, html, lang)` stream —
    * continuous crawl ingestion. Identical parse as [[read]]; the file
    * source tracks processed files in the checkpoint, so each WARC file is
    * ingested exactly once across restarts. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    parseFiles(spark.readStream.format("binaryFile")
      .schema(StructType(Seq( // file streams require an explicit schema
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .option("pathGlobFilter", "*.warc*").load(dir)
      .select(col("path"), col("content")))

  /** (path, content) rows -> parsed response records; works identically on
    * batch and streaming inputs (stateless flatMap). */
  private def parseFiles(files: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(readSchema)
    files.flatMap { r =>
      val bytes =
        if (r.getString(0).endsWith(".gz")) gunzipAll(r.getAs[Array[Byte]](1))
        else r.getAs[Array[Byte]](1)
      parseRecords(bytes)
    }(enc)
  }

  /** Decompress a stream of concatenated gzip members. */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in  = new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Walk records by Content-Length — no scanning inside payloads. */
  private def parseRecords(bytes: Array[Byte]): Iterator[Row] = new Iterator[Row] {
    private var pos = 0
    private var nextRow: Row = advance()
    override def hasNext: Boolean = nextRow != null
    override def next(): Row = { val r = nextRow; nextRow = advance(); r }

    private def headerEnd(from: Int): Int = { // index AFTER \r\n\r\n
      var i = from
      while (i + 3 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n' && bytes(i + 2) == '\r' && bytes(i + 3) == '\n')) i += 1
      if (i + 3 < bytes.length) i + 4 else -1
    }

    @annotation.tailrec
    private def advance(): Row = {
      if (pos >= bytes.length) null
      else {
        val he = headerEnd(pos)
        if (he < 0) null
        else {
          val header = new String(bytes, pos, he - pos, UTF_8)
          if (!header.startsWith("WARC/")) null // corrupt tail: stop cleanly
          else {
            def h(name: String): String = {
              val idx = header.indexOf(s"\r\n$name:")
              if (idx < 0) null
              else {
                val s = idx + name.length + 3
                val e = header.indexOf("\r\n", s)
                header.substring(s, if (e < 0) header.length else e).trim
              }
            }
            val len = h("Content-Length").toInt
            val payloadStart = he
            pos = payloadStart + len + 4 // skip \r\n\r\n record separator
            if (h("WARC-Type") != "response") advance()
            else {
              val html = java.util.Arrays.copyOfRange(bytes, payloadStart, payloadStart + len)
              val uri  = h("WARC-Target-URI")
              val ts   = java.sql.Timestamp.from(Instant.parse(h("WARC-Date")))
              Row(uri, ts, html, h("WARC-Identified-Content-Language"))
            }
          }
        }
      }
    }
  }
}
