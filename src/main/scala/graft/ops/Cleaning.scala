package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-cleaning operators (SURVEY §2a P1–P3).
  *
  * Reference semantics: /root/reference/untitled.py:26 replaces the GSOD
  * sentinels {0.0, -999.0, -999.9} with NaN; :27 drops rows missing LAT/LON;
  * :29-30 keeps stations covering the whole query window (year prefix of a
  * yyyymmdd value). We standardize on SQL NULL (not NaN — Spark distinguishes
  * them; NULL composes with every aggregate/filter the way pandas NaN did).
  *
  * All pure column expressions — fully codegen'd, pushdown-friendly; the
  * not-null filter reaches the parquet scan as an IsNotNull pushed filter.
  */
object Cleaning {
  val GsodSentinels: Seq[Double] = Seq(0.0, -999.0, -999.9)

  /** P1: sentinel values → NULL for one column. */
  def sentinelToNull(c: Column, sentinels: Seq[Double] = GsodSentinels): Column =
    when(c.isin(sentinels: _*), lit(null)).otherwise(c)

  /** P1 over many columns, keeping all others intact. */
  def sentinelToNull(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, n) => d.withColumn(n, sentinelToNull(col(n))))

  /** P2: keep rows where every listed column is present. */
  def requireNotNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))

  /** P3: coverage-window predicate on the 4-digit year prefix of a
    * yyyyMMdd-formatted value (string-prefix semantics, as the reference
    * computes it — not date arithmetic). */
  def yearPrefix(c: Column): Column =
    substring(c.cast("string"), 1, 4).cast("int")
}
