package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-verifiable query.
  *
  * @param name   key in `SparkEntry.queries`
  * @param run    (session, sfDir) => result; MUST be deterministic: explicit
  *               ORDER BY, seeded sampling, exact (non-approx) aggregates,
  *               and column names identical to the oracle's (the driver's
  *               compare sorts columns by name before hashing values).
  * @param oracle equivalent DuckDB ANSI SQL over the same parquet tables;
  *               None for ops whose output is not SQL-expressible (ML models,
  *               LSH bucketing, engine-specific hashes) — the driver then
  *               records a weaker rows-only check.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
