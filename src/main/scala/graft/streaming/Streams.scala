package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.Windows

/** Structured-Streaming twins of the batch event queries (SURVEY §2b E7).
  * Each applies a watermark (bounding state for append-mode sinks) and
  * delegates to the SHARED aggregation bodies in graft.ops.Windows — the
  * batch queries call the same functions, so batch and streaming semantics
  * cannot drift. StreamingSpec drives these through MemoryStream and
  * cross-checks against the batch results on identical data.
  *
  * Scale: watermark + tumbling window is Spark's bounded-state path — the
  * state store holds only open windows per key; session windows merge on
  * overlap with the same bound.
  */
object Streams {

  /** Streaming twin of q_window_tumbling: 1-hour tumbling counts/sums per
    * event type, 10-minute watermark for late data. */
  def tumblingByType(events: DataFrame): DataFrame =
    Windows.tumblingByType(events.withWatermark("ts", "10 minutes"))

  /** Streaming twin of q_session_window: native 30-minute-gap session
    * windows per user. */
  def sessionsByUser(events: DataFrame): DataFrame =
    Windows.sessionWindowByUser(events.withWatermark("ts", "10 minutes"))

  /** Streaming twin of q_window_sliding: 1-hour windows sliding every
    * 15 minutes. */
  def slidingByType(events: DataFrame): DataFrame =
    Windows.slidingByType(events.withWatermark("ts", "10 minutes"))

  /** Streaming exact dedup (the training-pipeline ingest primitive —
    * the stream sibling of Dedup.exact): keep the first event per id,
    * with state bounded by the watermark instead of growing forever.
    * Duplicates arriving within the watermark delay are dropped; the
    * state store evicts ids once the watermark passes them. */
  def dedupById(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
}
