package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Events
import graft.streaming.StreamOps

/** Structured Streaming formulations against their batch equivalents: the
  * keyed-state sessionizer must emit exactly what `Events.sessionize`
  * computes on the same rows (once the watermark closes every session), and
  * watermarked streaming dedup must keep first-seen docs across
  * micro-batches. */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

  test("sessionizeStream: keyed state + event-time timeout matches batch sessionize") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamOps.sessionizeStream(
        input.toDS().toDF("user_id", "ts", "value"),
        gapSeconds = 1800L, watermark = "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sessout").start()

    // batch 1: user 7 opens a session (2 events), user 9 opens one
    input.addData((7L, ts(0), 1.0), (7L, ts(60), 2.0), (9L, ts(10), 5.0))
    q.processAllAvailable()
    // batch 2: user 7's gap 1861s > 1800 — closes session 1 event-driven
    input.addData((7L, ts(1921), 3.0))
    q.processAllAvailable()
    // batches 3+4: a far-future event pushes the watermark past every open
    // session's (ended + gap) deadline; the following batch fires the
    // event-time timeouts
    input.addData((99L, ts(100000), 0.0))
    q.processAllAvailable()
    input.addData((99L, ts(100001), 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.sql(
        "SELECT user_id, session_id, events, started, ended, total_value FROM sessout")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4), r.getDouble(5))).toSet

    val batchEvents = Seq(
      (1L, ts(0), 7L, "c", 1.0, ""), (2L, ts(60), 7L, "c", 2.0, ""),
      (3L, ts(1921), 7L, "c", 3.0, ""), (4L, ts(10), 9L, "v", 5.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val expected = Events.sessionize(batchEvents, gapSeconds = 1800L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4), r.getDouble(5))).toSet

    assert(got == expected) // user 99's session is still open — not emitted
  }

  test("dedupExactStream: first-seen doc per fingerprint across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamOps.dedupExactStream(
        input.toDS().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedupout").start()

    input.addData((1L, ts(0), "Hello   World"), (2L, ts(1), "something else"))
    q.processAllAvailable()
    // same normalized fingerprint as doc 1 -> dropped; doc 4 is new
    input.addData((3L, ts(2), "hello world"), (4L, ts(3), "fresh text"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.sql("SELECT doc_id FROM dedupout").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L))
  }

  test("minHashCandidateStream: streamed candidate set equals the batch LSH candidates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // planted near-dups (1,2) and (5,6); 3/4 unrelated
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val near = (1 to 57).map(i => s"token$i").mkString(" ") + " tokenX tokenY tokenZ"
    val corpus = Seq(
      1L -> base, 2L -> near,
      3L -> (1 to 60).map(i => s"other$i").mkString(" "),
      4L -> (1 to 60).map(i => s"word$i").mkString(" "),
      5L -> "dup dup text here we go again and again",
      6L -> "dup dup text here we go again and again")

    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamOps.minHashCandidateStream(
        input.toDS().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("mhcout").start()

    // split across micro-batches so cross-batch bucket state is exercised:
    // doc 2 (near-dup of 1) and doc 6 (dup of 5) arrive in the second batch
    val (a, b) = corpus.splitAt(3)
    input.addData(a.map { case (i, t) => (i, ts(i), t) })
    q.processAllAvailable()
    input.addData(b.map { case (i, t) => (i, ts(i), t) })
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql("SELECT DISTINCT id_a, id_b FROM mhcout")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.ops.Dedup.minHashCandidates(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(streamed.contains((1L, 2L)) && streamed.contains((5L, 6L)))
  }

  test("warc file stream -> link-edge stream matches the batch derivation, dedups re-crawls") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-stream").toString
    try {
      // one fixed 250-page crawl; wave 1 covers pages 0..149, wave 2 covers
      // 100..249 — the 100..149 overlap is a re-crawl the stream must dedup
      val crawl  = graft.io.Pages.synth(spark, 250L, seed = 3L)
      val pageNo = regexp_extract(col("url"), "/p/(\\d+)$", 1).cast("long")
      val wave1 = crawl.where(pageNo < 150)
      val wave2 = crawl.where(pageNo >= 100)

      graft.io.Warc.write(wave1.coalesce(1), dir, prefix = "w1")
      val q = graft.streaming.StreamOps.linkEdgesStream(
          graft.io.Warc.readStream(spark, dir), watermark = "1 hour")
        .writeStream.outputMode("append").format("memory").queryName("warcedges").start()
      q.processAllAvailable()
      graft.io.Warc.write(wave2.coalesce(1), dir, prefix = "w2")
      q.processAllAvailable()
      q.stop()

      val got = spark.sql("SELECT src, dst FROM warcedges")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // no duplicate edges despite the re-crawl overlap (within-watermark dedup)
      assert(got.length === got.toSet.size)
      // equals the batch derivation over the full crawl
      val batch = graft.io.Pages.toGraph(crawl)
        .edges.select("src", "dst").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.toSet === batch)
    } finally graft.io.Fs.deleteRecursively(dir)
  }
}
