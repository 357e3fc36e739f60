package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * Scale notes (100 TB design): every loader is a plain parquet scan, so
  * Catalyst pushes filters/projections into the columnar reader and, on a
  * real cluster, partition directories prune for free. No `inferSchema`
  * anywhere — parquet footers carry the schema (SURVEY §1.3).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Round-robin repartition to the session's core count — for CPU-heavy
    * per-row stages (shingling, k-means, model fits) over SMALL inputs.
    * The test tables are single parquet files under one HDFS-block split,
    * so without this every expression pipeline runs as ONE task (measured:
    * 9 s single-task shingling vs sub-second fanned out). At 100 TB inputs
    * arrive in thousands of splits and this becomes a no-op cost-wise —
    * but a compute-bound stage after a selective filter hits the same
    * cliff there, and the same fix applies. */
  def fanOut(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark's reader
    * rejects outright (no nanosecond TimestampType). Read it as raw nanos
    * (legacy flag) and convert to a µs timestamp with integer division —
    * lossless here (TESTDATA values are µs-aligned) and integer `DIV` is
    * mandatory: epoch-nanos ≈ 1.7e18 overflows double's 2^53 mantissa.
    *
    * The nanosAsLong flag is set at session BUILD time by every in-repo
    * entry point (Verify / Bench / SparkSpec). For sessions built
    * elsewhere (the driver's own harness), the loader sets it ONLY when
    * unset — a DOCUMENTED session-wide effect: the flag only changes how
    * nanos-typed parquet is read, and every nanos table this engine
    * touches needs the same setting. A session that EXPLICITLY disabled
    * it still gets the override (the read cannot work any other way —
    * Spark has no nanosecond TimestampType), but with a logged WARNING
    * instead of the previous silent config mutation. Boolean parsing is
    * case-insensitive, matching Spark's own conf semantics. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") match {
      case Some(v) if v.equalsIgnoreCase("true") => ()
      case None => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      case Some(other) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"events.parquet carries INT64 TIMESTAMP(NANOS); overriding " +
            s"spark.sql.legacy.parquet.nanosAsLong='$other' to 'true' for " +
            "this session — the read is impossible without it")
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
