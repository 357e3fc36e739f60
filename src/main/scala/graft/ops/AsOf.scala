package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each fact row, attach the LATEST dim row with
  * `dimTs <= factTs` (inclusive) sharing the key columns — the
  * point-in-time lookup every event/feature pipeline needs (price as of
  * trade time, profile as of event time).
  *
  * Spark has no as-of join operator; per the preference order (SURVEY §4 /
  * the custom-operator ladder) this COMPOSES built-ins instead of adding a
  * custom SparkPlan: tag dim and fact rows, union them, and carry the last
  * non-null dim payload forward with a running `last(ignoreNulls)` window
  * ordered by (ts, dim-first). One shuffle on the keys, no join at all —
  * at 100 TB this is a single exchange + sort, immune to the range-join
  * blowup a naive `fact.ts >= dim.ts` theta-join would cause.
  *
  * Determinism: at equal timestamps the dim row wins (inclusive >=); if
  * several dim rows share (key, ts) the caller must dedupe first (the
  * query does, keeping max id) — matching DuckDB ASOF JOIN, whose pick
  * among ts-ties is unspecified.
  *
  * Dim payload columns come back nullable (facts before any dim match
  * keep NULLs — ASOF LEFT JOIN semantics).
  */
object AsOf {

  def joinAsOf(facts: DataFrame, dims: DataFrame, keys: Seq[String],
      factTs: String, dimTs: String): DataFrame = {
    val dimPayload = dims.columns.filterNot(c => keys.contains(c) || c == dimTs)
    val factCols = facts.columns
    val dimSide = dims.select(
      (keys.map(col) :+ col(dimTs).as("__ts") :+ lit(1).as("__is_dim") :+
        struct(dimPayload.map(col): _*).as("__dim")): _*)
    val factSide = facts.select(
      (keys.map(col) :+ col(factTs).as("__ts") :+ lit(0).as("__is_dim") :+
        struct(factCols.map(col): _*).as("__fact")): _*)
    val combined = dimSide.unionByName(factSide, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn("__last_dim", last(col("__dim"), ignoreNulls = true).over(w))
      .filter(col("__is_dim") === 0)
      .select(
        (factCols.map(c => col(s"__fact.$c")) ++
          dimPayload.map(c => col(s"__last_dim.$c"))): _*)
  }
}
