package graft.tools

import org.apache.spark.sql.SparkSession

/** Session-order-independence sweep — the gate the q_adamic_adar
  * landmine motivated: that query PASSED every full sweep for ten rounds
  * because earlier queries had materialized a shared cache that nudged
  * Catalyst into a plan shape deferring a partial expression
  * (1e9/ln(deg), ÷0 at deg=1) past the filter that discards its poison
  * rows — and THREW when run standalone, where the cold plan evaluated
  * it on the join input. Result correctness was never affected (the
  * poison rows are discarded either way); the failure mode was a
  * plan-shape-dependent ANSI runtime error. A library must give the
  * same answer to a user who runs ONE query in a fresh session as to
  * the driver's warm 362-query sweep.
  *
  * Shape: one session, two passes over the ENTIRE registry —
  *   pass 1 (warm): registry order, shared caches accumulate exactly as
  *     in the driver's Verify sweep;
  *   pass 2 (cold): alphabetical order, `spark.catalog.clearCache()`
  *     before EVERY query — each query re-plans from cold inputs, the
  *     standalone-session equivalent (cache registration still happens,
  *     but nothing is ever warm and no other query's materialization
  *     can shape this query's plan).
  * Every query must produce the SAME canonical result in both passes
  * and throw in neither. Exits nonzero otherwise.
  *
  * Usage: runMain graft.tools.IsolationSweep [sfDir]
  */
object IsolationSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def canonOf(q: String): Either[String, (String, Long)] =
      try Right(ClusterGate.canon(graft.SparkEntry.queries(q)(spark, sfDir)))
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(160))
      }

    // true registry order (the ordered spec Seq, not the unordered Map —
    // Map iteration is hash order, which only happens to match Verify)
    val warmOrder = graft.SparkEntry.specs.map(_.name)
    val warm = warmOrder.map(q => q -> canonOf(q)).toMap
    val cold = warmOrder.sorted.map { q =>
      spark.catalog.clearCache()
      q -> canonOf(q)
    }.toMap

    var bad = 0
    warmOrder.sorted.foreach { q =>
      (warm(q), cold(q)) match {
        case (Right(a), Right(b)) if a == b => ()
        case (w, c) =>
          println(s"[isolation] $q ORDER-DEPENDENT: warm=$w cold=$c")
          bad += 1
      }
    }
    println(s"[isolation] ${warmOrder.size - bad}/${warmOrder.size} " +
      "queries identical warm-sweep vs cold-per-query")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
