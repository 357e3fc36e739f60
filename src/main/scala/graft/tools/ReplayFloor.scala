package graft.tools

import org.apache.spark.sql.SparkSession

/** Replay-harness floor audit (VERDICT r9 item 8): the streaming gates
  * pay a per-trigger machinery cost that is independent of the (now
  * FeedCap-constant) row volume. This tool decomposes it by timing
  * representative replays across slice counts and both state-store
  * providers:
  *
  *   wall(slices) ≈ intercept (stream start/stop + planning of the
  *   2 sentinel triggers) + slices × per-trigger floor (micro-batch
  *   planning + state-store commit IO)
  *
  * The slope IS the per-trigger floor; the RocksDB-vs-default gap at
  * equal slices isolates the state-IO share of it. The numbers feed the
  * Bench slice-dial decision (graft.replay.slices): the oracles are
  * slice-count-invariant, so the BENCH replays can run the smallest
  * slice count that still exercises cross-batch state (≥2 data slices —
  * state must chain across at least one batch boundary — plus the two
  * sentinel closes), while the CORRECTNESS gate keeps the full default.
  *
  * Usage: runMain graft.tools.ReplayFloor [sfDir] (min-of-2 per cell;
  * SPARK_GRAFT_CANARY_PASSES overrides).
  */
object ReplayFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val passes = sys.env.getOrElse("SPARK_GRAFT_CANARY_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.events(spark, sfDir).cache().count() // warm the feed scan

    val runners: Seq[(String, (SparkSession, String) => Any)] = Seq(
      "tumbling" -> ((s, d) => graft.streaming.Replay.tumbling(s, d).count()),
      "dedup" -> ((s, d) => graft.streaming.Replay.dedup(s, d).count()),
      "tumbling_rocksdb" ->
        ((s, d) => graft.streaming.Replay.tumblingRocksDb(s, d).count()),
      "dedup_rocksdb" ->
        ((s, d) => graft.streaming.Replay.dedupRocksDb(s, d).count()))
    val sliceCounts = Seq(1, 2, 4, 8)

    println(f"[replay-floor] ${"runner"}%-18s" +
      sliceCounts.map(n => f"${n}%7d").mkString + "   slope_s/trigger")
    runners.foreach { case (name, run) =>
      val walls = sliceCounts.map { n =>
        spark.conf.set("graft.replay.slices", n.toString)
        val w = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          run(spark, sfDir)
          (System.nanoTime() - t0) / 1e9
        }.min
        w
      }
      spark.conf.unset("graft.replay.slices")
      // least-squares slope of wall vs TRIGGER count (slices + 2 sentinels)
      val xs = sliceCounts.map(_ + 2.0)
      val xm = xs.sum / xs.size; val ym = walls.sum / walls.size
      val slope = xs.zip(walls).map { case (x, y) => (x - xm) * (y - ym) }
        .sum / xs.map(x => (x - xm) * (x - xm)).sum
      println(f"[replay-floor] $name%-18s" +
        walls.map(w => f"$w%7.2f").mkString + f"   ${slope}%.3f")
    }
    spark.stop()
  }
}
