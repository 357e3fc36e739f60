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

  /** Skew-safe fact⋈dim equi-join for hot keys too big to broadcast
    * around: the FACT side salts deterministically into `salts` sub-keys;
    * the DIM side replicates once per salt (explode of a `salts`-element
    * array — dim rows × salts, cheap when dim ≪ fact). A hot join key
    * then spreads across `salts` reducers instead of pinning one.
    * Result-identical to `fact.join(dim, key)` — every fact row still
    * meets every dim row of its key exactly once. Prefer broadcast when
    * the dim fits; prefer AQE skew-join when Spark can detect the skew —
    * this is the explicit fallback for the planner-invisible cases. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, idCols: Column*): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(salts, idCols: _*))
    val expandedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(expandedDim, Seq(key, "__salt")).drop("__salt")
  }

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
