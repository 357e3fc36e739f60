package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming twins of the batch event queries (SURVEY §2b E7).
  * Each takes a (possibly streaming) events DataFrame — `readStream` or
  * MemoryStream-backed — and returns the windowed aggregate; the watermark
  * bounds state for append-mode sinks. StreamingSpec drives these through
  * MemoryStream and cross-checks against the batch twins on identical data.
  *
  * Scale: watermark + tumbling window is Spark's bounded-state path — state
  * store holds only open windows per key; session windows merge on overlap
  * with the same bound.
  */
object Streams {

  /** Streaming twin of q_window_tumbling: 1-hour tumbling counts/sums per
    * event type, 10-minute watermark for late data. */
  def tumblingByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Native session windows (30-minute gap) per user — the built-in
    * alternative to the batch lag/running-sum sessionization in
    * graft.ops.Windows (q_session_window is its batch twin). */
  def sessionsByUser(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("user_id"), col("n_events"))
}
