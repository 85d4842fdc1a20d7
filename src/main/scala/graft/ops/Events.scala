package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props). The batch versions are
  * plain window/agg pipelines; `windowedCountsStream` is the Structured
  * Streaming formulation of the same aggregation (watermark + tumbling
  * window) and works on a `readStream` input unchanged. */
object Events {

  /** Gap-based sessionization: a new session starts when the user's
    * inter-event gap exceeds `gapSeconds`. Classic lag + running-sum window —
    * one shuffle on user_id. Emits (user_id, session_id, events, started,
    * ended, total_value). */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // fractional-second gap arithmetic: timestamp-to-double keeps the
      // microsecond part (unix_timestamp truncates to whole seconds and
      // splits/merges sessions differently from an exact-epoch engine).
      // TIMESTAMP_NTZ won't cast to double directly — hop through TIMESTAMP
      // (value-preserving under the UTC session timezone).
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             col("ts").cast("timestamp").cast("double") -
               col("prev_ts").cast("timestamp").cast("double") > gapSeconds.toDouble, 1)
          .otherwise(0))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy(col("user_id"), col("session_seq").as("session_id"))
      .agg(count(lit(1)).as("events"),
        min("ts").as("started"), max("ts").as("ended"),
        graft.core.Num.roundTo(sum("value"), 4).as("total_value"))
  }

  /** Tumbling-window event counts per type. Works identically on a batch
    * DataFrame and a streaming one (add the watermark upstream for streams). */
  def windowedCounts(events: DataFrame, windowExpr: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), windowExpr).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.core.Num.roundTo(sum("value"), 4).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** Streaming variant: watermarked tumbling-window counts, ready for
    * `events.readStream ... -> windowedCountsStream(...) -> writeStream`. */
  def windowedCountsStream(events: DataFrame, windowExpr: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    windowedCounts(events.withWatermark("ts", watermark), windowExpr)
}
