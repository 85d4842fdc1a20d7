package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.TextOps

/** Structured Streaming formulations of the pipeline operators whose batch
  * versions live in `graft.ops`: gap sessionization as custom keyed state
  * (`flatMapGroupsWithState` + event-time timeout) and exact streaming
  * dedup (watermarked `dropDuplicates`). Scale shape: state is partitioned
  * by the group key across executors, one open session (a few scalars) per
  * user — state size is O(active users), never O(events); the watermark
  * bounds both late data and state lifetime, so the query runs indefinitely
  * on an unbounded stream.
  */
object StreamOps {

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  /** started/ended are epoch MICROSECONDS — java.sql.Timestamp.getTime is
    * millis and would truncate parquet/Spark's microsecond timestamps. */
  final case class OpenSession(seq: Long, started: Long, ended: Long,
                               events: Long, total: Double)

  private def tsMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  final case class Session(user_id: Long, session_id: Long, events: Long,
                           started: Timestamp, ended: Timestamp,
                           total_value: Double)

  /** Gap-based sessionization over an unbounded event stream — the exact
    * semantics of `Events.sessionize` (a new session when a user's
    * inter-event gap exceeds `gapSeconds`; session_id numbers a user's
    * sessions 1.. in time order), expressed as keyed state: the open
    * session per user lives in `GroupState`, a session is emitted when a
    * later event closes it or when the event-time watermark passes its
    * close-out deadline (ended + gap). The watermark is applied here (after
    * the column normalization — a select/cast would strip an upstream
    * event-time tag); late rows beyond it are dropped by the engine before
    * they reach the state function.
    *
    * Micro-batches may deliver a user's events unsorted — each batch's
    * slice is sorted in-memory per (user, batch), which is bounded by the
    * trigger interval, not the stream. */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800L,
                       watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"),
        col("ts").cast("timestamp"),
        coalesce(col("value").cast("double"), lit(0.0)).as("value"))
      .withWatermark("ts", watermark)
      .as[SessionEvent]

    val gapUs = gapSeconds * 1000000L

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) => {
          def finalize(s: OpenSession): Session =
            Session(userId, s.seq, s.events,
              microsTs(s.started), microsTs(s.ended),
              // Num.roundTo(_, 4) semantics — identical to the batch
              // sessionizer and its DuckDB oracle (nudged half-up)
              math.floor(s.total * 10000.0 + 0.5 + 1e-6) / 10000.0)

          if (!it.hasNext) {
            // event-time timeout: the watermark passed ended+gap — no later
            // event can extend this session any more.
            val out = state.getOption.map(finalize).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toArray.sortBy(e => (tsMicros(e.ts), e.value))
            var open = state.getOption
            val done = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = tsMicros(e.ts)
              open match {
                case Some(s) if t - s.ended <= gapUs =>
                  open = Some(s.copy(ended = math.max(s.ended, t),
                    events = s.events + 1, total = s.total + e.value))
                case Some(s) =>
                  done += finalize(s)
                  open = Some(OpenSession(s.seq + 1, t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(1L, t, t, 1L, e.value))
              }
            }
            val s = open.get
            state.update(s)
            // deadline in millis, rounded UP so it is never earlier than the
            // true micros deadline
            state.setTimeoutTimestamp(math.floorDiv(s.ended + gapUs + 999L, 1000L))
            done.result().iterator
          }
        })
  }

  final case class BandRow(id: Long, ts: Timestamp, band: Int, bucket: Long)
  final case class BucketState(ids: Array[Long], lastUs: Long)

  /** Streaming MinHash-LSH near-duplicate DETECTION: each arriving
    * document's banded signature buckets are matched against the keyed
    * state of earlier documents in the same bucket; every shared bucket
    * emits a candidate pair. Downstream (batch or the caller) dedups pairs
    * across bands and exact-verifies — the same candidates→verify split as
    * `Dedup.minHashNearDuplicatesExact`.
    *
    * Parity with the batch path: the signature is the SAME arithmetic as
    * `Dedup.minHashSignature` — shingle-hash once, re-hash the 8-byte long
    * per permutation, min — but expressed per ROW (`transform`/`array_min`
    * over the row's own shingle array) instead of explode+groupBy, because
    * an aggregation before keyed state is not appendable on a stream; a
    * doc's shingles all live in its row, so no shuffle is needed at all
    * until the bucket grouping. StreamingSpec asserts the emitted candidate
    * set equals `Dedup.minHashCandidates` exactly.
    *
    * Scale shape: state shards by (band, bucket) key across executors;
    * each bucket holds at most `maxBucketSize` doc ids (hot buckets stop
    * absorbing new members — metric-visible degradation, like the banding
    * assumption itself) and expires via event-time timeout once the
    * watermark passes its last member + `stateHorizonSeconds`, so state is
    * O(docs in horizon × bands), never O(stream). */
  def minHashCandidateStream(docs: DataFrame, idCol: String, textCol: String,
                             tsCol: String, numHashes: Int = 32,
                             bands: Int = 16, shingleSize: Int = 3,
                             watermark: String = "1 hour",
                             stateHorizonSeconds: Long = 3600L,
                             maxBucketSize: Int = 1024): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val hs = transform(graft.ops.Dedup.shingles(col(textCol), shingleSize),
      s => xxhash64(s))
    val sig = array((0 until numHashes).map(p =>
      array_min(transform(col("__hs"), h => xxhash64(h, lit(p))))): _*)
    val buckets = array((0 until bands).map { b =>
      xxhash64(concat_ws(",", slice(col("__sig"), b * rowsPerBand + 1, rowsPerBand)))
    }: _*)
    val banded = docs
      .select(col(idCol).cast("long").as("id"), col(tsCol).cast("timestamp").as("ts"),
        hs.as("__hs"))
      .withColumn("__sig", sig)
      .withWatermark("ts", watermark)
      .select(col("id"), col("ts"), posexplode(buckets).as(Seq("band", "bucket")))
      .as[BandRow]

    banded.groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long), it: Iterator[BandRow], state: GroupState[BucketState]) => {
          if (!it.hasNext) { state.remove(); Iterator.empty }
          else {
            // batch slices may arrive unsorted; id order makes the
            // earlier-member set deterministic within a batch
            val rows = it.toArray.sortBy(_.id)
            var ids = state.getOption.map(_.ids.toVector).getOrElse(Vector.empty)
            var lastUs = state.getOption.map(_.lastUs).getOrElse(Long.MinValue)
            val out = Seq.newBuilder[(Long, Long)]
            for (r <- rows) {
              for (e <- ids if e != r.id)
                out += ((math.min(e, r.id), math.max(e, r.id)))
              if (ids.length < maxBucketSize) ids = ids :+ r.id
              lastUs = math.max(lastUs, tsMicros(r.ts))
            }
            state.update(BucketState(ids.toArray, lastUs))
            state.setTimeoutTimestamp(
              math.floorDiv(lastUs + stateHorizonSeconds * 1000000L + 999L, 1000L))
            out.result().iterator
          }
        })
      .toDF("id_a", "id_b")
  }

  /** Streaming exact dedup: first-seen document per normalized-text
    * fingerprint. Watermarked `dropDuplicates` keeps per-fingerprint state
    * only until the watermark passes it — bounded state on an unbounded
    * stream (duplicates farther apart than the watermark horizon are kept;
    * choose the horizon by the corpus's duplication locality). */
  def dedupExactStream(docs: DataFrame, idCol: String, textCol: String,
                       tsCol: String, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("fp")
      .drop("fp")

  /** Continuous crawl ingestion tail: a pages stream (e.g. `Warc.readStream`)
    * -> link-graph edge stream `(src, dst, warc_ts)` with ids = xxhash64(url)
    * exactly like the batch `Pages.toGraph`. Link extraction is stateless
    * column work; the only state is the watermark-bounded
    * `dropDuplicatesWithinWatermark` on (src, dst), so re-crawled pages
    * within the horizon don't re-emit their edges — the incremental way to
    * maintain an edge table a downstream (batch) PageRank/WCC run reads.
    * State is O(distinct edges in horizon), never O(stream). */
  def linkEdgesStream(pages: DataFrame, watermark: String = "1 hour"): DataFrame =
    pages.withWatermark("warc_ts", watermark)
      .select(col("url"), col("warc_ts"),
        explode(graft.io.Pages.hrefs(col("html"))).as("href"))
      .select(xxhash64(col("url")).as("src"), xxhash64(col("href")).as("dst"),
        col("warc_ts"))
      .dropDuplicatesWithinWatermark("src", "dst")
}
