package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ml.MlPipeline

/** ML dataflow surface (SURVEY §2a M1–M4) as driver-verifiable queries. */
object MlQueries {

  private val FeatureCols = Seq("l_quantity", "l_discount", "l_tax")

  /** M1 relational twin: feature assembly as a plain array column — the
    * SQL-expressible shape of VectorAssembler's output (the VectorUDT
    * variant runs inside q_gbt_predict; parquet can't carry VectorUDT in a
    * DuckDB-comparable form). The assembled array is built in-plan, then
    * the COMPARED projection unpacks it back to scalars: the driver's
    * pandas-side comparer cannot sort/hash array cells (unhashable
    * ndarray), so the gate output must be scalar columns. */
  val vectorAssemble = QuerySpec(
    "q_vector_assemble",
    (s, d) =>
      lineitem(s, d)
        .withColumn("features", array(FeatureCols.map(col): _*))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          size(col("features")).as("n_features"),
          element_at(col("features"), 1).as("f_qty"),
          element_at(col("features"), 2).as("f_disc"),
          element_at(col("features"), 3).as("f_tax"),
          col("l_extendedprice").as("label"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(len([l_quantity, l_discount, l_tax]) AS INTEGER) AS n_features,
             [l_quantity, l_discount, l_tax][1] AS f_qty,
             [l_quantity, l_discount, l_tax][2] AS f_disc,
             [l_quantity, l_discount, l_tax][3] AS f_tax,
             l_extendedprice AS label
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
    """))

  /** M2: seeded 70/30 split — summarized per side (counts + exact key sum)
    * so the output is tiny and the invariants (disjoint, exhaustive) are
    * visible. Sampling isn't SQL-oracle-able (SURVEY M2); MlSpec asserts
    * the invariants instead. */
  val randomSplit = QuerySpec(
    "q_random_split",
    (s, d) => {
      val (train, test) = MlPipeline.seededSplit(orders(s, d))
      train.withColumn("side", lit("train"))
        .unionByName(test.withColumn("side", lit("test")))
        .groupBy("side")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy("side")
    },
    None)

  /** M3+M4: assemble → seeded split → GBT fit (10 iterations, depth 4) →
    * predictions on the held-out side. Model output isn't SQL-expressible;
    * MlSpec checks RMSE is finite and beats the constant-mean predictor. */
  val gbtPredict = QuerySpec(
    "q_gbt_predict",
    (s, d) => {
      val base = lineitem(s, d)
        .select((Seq("l_orderkey", "l_linenumber", "l_extendedprice") ++ FeatureCols)
          .map(col): _*)
      // Boosting is a driver-orchestrated loop of ~5 aggregation jobs per
      // tree; per-JOB overhead scales with task count, so size partitions
      // by data volume (8 × ~50k rows at sf0.1), not core count — 32
      // tiny tasks per job made scheduling the dominant cost (re-measured:
      // 8 beats 16 here, 6.5s vs 6.8s min-of-2). At 100 TB the input
      // arrives in byte-sized splits and this repartition is a
      // sample-then-fit decision instead.
      val features = MlPipeline.assemble(base.repartition(8), FeatureCols)
      val (train, test) = MlPipeline.seededSplit(features)
      // Cap the fitted sample at ~150k rows. The fraction comes from a
      // column-less count of the BASE parquet table (cheap metadata-ish
      // scan) × the 0.7 split share — never a count through the
      // split+assemble lineage, which would be a full feature pass.
      val frac = math.min(1.0, 150000.0 / (0.7 * base.count()))
      val model = MlPipeline.trainGbt(train, "l_extendedprice", maxIter = 10,
        sampleFraction = frac)
      model.transform(test)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("label"),
          round(col("prediction"), 4).as("prediction"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    None)

  /** Stratified (per-stratum) sampling — the dataset-mixing primitive of a
    * training pipeline (sample each source/language at its own rate).
    * Seeded `sampleBy`; sampling isn't SQL-oracle-able (SURVEY M2), so the
    * output is per-stratum counts and MlSpec bounds the rates. */
  /** Mixing rates shared with MlSpec's 4σ bound check. */
  val StratifiedFractions: Map[String, Double] = Map(
    "en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 0.25, "zh" -> 0.25)

  val sampleStratified = QuerySpec(
    "q_sample_stratified",
    (s, d) => {
      documents(s, d)
        .stat.sampleBy("lang", StratifiedFractions, 42L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")
    },
    None)

  val all: Seq[QuerySpec] = Seq(
    vectorAssemble, randomSplit, gbtPredict, sampleStratified)
}
