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
}
