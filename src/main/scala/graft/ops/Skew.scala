package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY "Partitioning & shuffle" mandate): two-phase
  * salted aggregation. A hot grouping key that would pin one reducer is
  * split across `salts` sub-keys; phase 1 aggregates (key, salt) partials,
  * phase 2 merges per key. Correct for any algebraic aggregate expressed
  * as (partial, merge) pairs — counts and sums here.
  *
  * The salt must be DETERMINISTIC per row (hash of stable columns mod
  * salts, never rand()): retried tasks must re-salt identically, or a
  * retry double-counts rows — the classic salting bug at scale.
  */
object Skew {

  /** Deterministic salt in [0, salts) from stable id columns. */
  def salt(salts: Int, idCols: Column*): Column =
    pmod(hash(idCols: _*), lit(salts))

  /** count + decimal-sum per key, two-phase over a salted sub-key. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      salts: Int, idCols: Column*): DataFrame =
    df.withColumn("__salt", salt(salts, idCols: _*))
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s"))
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n_rows"),
        sum(col("__s")).cast("double").as("total"))
}
