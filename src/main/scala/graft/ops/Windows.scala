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
}
