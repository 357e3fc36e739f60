package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (UTC, small shuffle width).
  *
  * `local[4, 2]` (maxFailures = 2): task retries are ON, as on any real
  * cluster. RetrySpec injects attempt-0 task failures to prove the
  * seeded-sample / MinHash / ANN-encode paths are retry-deterministic;
  * with the default local maxFailures = 1 the injected failure would
  * abort the job instead of re-attempting. Suites that never fail a
  * task are unaffected.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def resource(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  val Sf001 = "/root/testdata/sf0.001"
}
