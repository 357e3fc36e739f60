package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY §2a W1, §2b E7-batch).
  *
  * W1 reference: /root/reference/untitled.py:80 — keep the rows whose date
  * equals the per-station max ("current conditions per station"). The
  * reference filters per file; here it is one window over the whole input.
  * Ties: the max-filter keeps all tied rows, matching the reference.
  *
  * Scale: `max().over(partitionBy(k))` is a single shuffle on the key —
  * same cost class as the groupBy+join alternative but one pass. For
  * 100 TB with a hot key, pre-aggregation (groupBy(k).agg(max)) +
  * broadcast-back is the fallback; keys here (station / user_id) are
  * high-cardinality and unskewed.
  */
object Windows {
  /** W1: rows carrying the per-key maximum of `ord` (ties kept). */
  def latestPerKey(df: DataFrame, keys: Seq[String], ord: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__mx", max(col(ord)).over(w))
      .filter(col(ord) === col("__mx"))
      .drop("__mx")
  }

  /** E7 sessionization (batch twin): assign session ids per key where a gap
    * of more than `gapSeconds` between consecutive events starts a new
    * session. Two windows over the same (key, ts) shuffle — Spark reuses the
    * partitioning, so this is one exchange. */
  def sessionize(df: DataFrame, key: String, ts: String, gapSeconds: Long,
      tiebreak: String): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    df.withColumn("__prev", lag(col(ts), 1).over(byKey))
      .withColumn(
        "__new",
        when(col("__prev").isNull ||
          col(ts).cast("long") - col("__prev").cast("long") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** E7 shared aggregation bodies — the batch queries (EventQueries) and
    * the streaming twins (graft.streaming.Streams, which prepend a
    * watermark) both call THESE, so the two forms cannot drift. */
  def tumblingByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  def slidingByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n_events"))

  def sessionWindowByUser(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("user_id"), col("n_events"))
}
