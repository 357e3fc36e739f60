package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.SparkSession

/** Concurrent-query gate (VERDICT r10 item 2).
  *
  * Every sweep so far ran queries SERIALLY; a real cluster runs many
  * queries concurrently in one session (a fair-scheduled multi-tenant
  * driver). Concurrency is the one axis where shared mutable state —
  * temp-view name collisions, session-conf scoping races (the
  * Replay.startScoped save/set/restore sequence), cache double-
  * materialization, scratch-dir reuse — can corrupt answers while every
  * serial gate stays green.
  *
  * Shape: ONE SparkSession (FAIR scheduler, as a multi-tenant driver
  * runs), a representative ~32-query subset spanning the hazard classes
  * (shared temp views, ANN persistence chains, streaming replays on both
  * providers, cached iterative loops, driver-built fixtures, seeded
  * sampling), run (1) serially for the baseline canon, then (2) from 8
  * worker threads draining one work queue — bit-identical canonical
  * results required, zero exceptions, and the pass fails as VACUOUS
  * unless ≥4 queries were observably in flight at once.
  *
  * Usage: runMain graft.tools.ConcurrencyGate [sfDir] [nThreads]
  * Exits nonzero on mismatch, exception, or no real overlap.
  */
object ConcurrencyGate {

  /** Hazard-class representatives. Kept explicit so a reader knows what
    * is proven concurrency-safe; the shared-temp-view quartet
    * (lineitem/orders/documents_sqlfn views) is the class most likely to
    * collide by construction. */
  val DefaultQueries: Seq[String] = Seq(
    // shared temp-view names (createOrReplaceTempView in one catalog)
    "q_sql_agg", "q_grouping_sets", "q_scalar_subquery",
    "q_sql_custom_funcs",
    // ANN persistence chains (scratch dirs, pointer swap, manifest)
    "q_ann_persist", "q_ann_compact",
    // streaming replays, both providers (session-conf scoping race)
    "q_stream_tumbling", "q_stream_dedup_rocksdb",
    // custom codegen Expressions under concurrent codegen/compilation
    "q_dedup_minhash", "q_dedup_near", "q_fingerprint", "q_lang_id",
    "q_quality_score",
    // joins / aggs / windows (broadcast + shuffle under fair scheduling)
    "q_monthly_rollup", "q_join_inner", "q_groupby_median",
    "q_latest_per_key", "q_topk", "q_salted_agg", "q_bucket_join",
    // cached/checkpointed iterative loops (shared cache races)
    "q_pagerank", "q_cc_labels", "q_adamic_adar", "q_dedup_clusters",
    // driver-built ingest fixtures + file sinks
    "q_gsod_e2e", "q_gsod_tar", "q_parse_text", "q_format_roundtrip",
    // ML / seeded sampling / similarity
    "q_random_split", "q_gbt_predict", "q_kmeans_assign", "q_semdedup")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nThreads = args.lift(1).map(_.toInt).getOrElse(8)
    val queries = DefaultQueries
    val unknown = queries.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def canonOf(q: String): Either[String, (String, Long)] =
      try Right(ClusterGate.canon(graft.SparkEntry.queries(q)(spark, sfDir)))
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(160))
      }

    // pass 1: serial baseline in one order
    val serial = queries.map(q => q -> canonOf(q)).toMap

    // pass 2: N threads drain one queue, reverse order (so the schedule
    // differs from the baseline's); track true overlap for anti-vacuity
    val work = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    queries.reverse.foreach(work.add)
    val results = new java.util.concurrent.ConcurrentHashMap[
      String, Either[String, (String, Long)]]()
    val active = new AtomicInteger(0)
    val maxActive = new AtomicInteger(0)
    val threads = (0 until nThreads).map { i =>
      val t = new Thread(() => {
        var q = work.poll()
        while (q != null) {
          val now = active.incrementAndGet()
          maxActive.accumulateAndGet(now, math.max)
          try results.put(q, canonOf(q))
          finally active.decrementAndGet()
          q = work.poll()
        }
      }, s"graft-concurrency-$i")
      t.start(); t
    }
    threads.foreach(_.join())

    var bad = 0
    println(f"[concurrency] ${"query"}%-24s ${"rows"}%7s  verdict")
    queries.foreach { q =>
      (serial(q), Option(results.get(q))) match {
        case (Right((hs, ns)), Some(Right((hc, nc)))) =>
          if (hs == hc && ns == nc)
            println(f"[concurrency] $q%-24s $ns%7d  OK")
          else {
            println(f"[concurrency] $q%-24s $ns%7d  MISMATCH " +
              s"(serial $hs/$ns vs concurrent $hc/$nc)")
            bad += 1
          }
        case (s, c) =>
          val err = (Seq(s) ++ c.toSeq).collectFirst {
            case Left(e) => e }.getOrElse("missing result")
          println(f"[concurrency] $q%-24s ${0}%7d  ERROR $err")
          bad += 1
      }
    }
    println(s"[concurrency] max in-flight: ${maxActive.get} " +
      s"(threads=$nThreads)")
    if (maxActive.get < 4) {
      println("[concurrency] VACUOUS: <4 queries ever overlapped")
      bad += 1
    }
    println(s"[concurrency] ${queries.size - bad}/${queries.size} " +
      "queries identical serial vs concurrent")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
