package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe: run the MemoryStream replay gates and print how many
  * micro-batches actually executed per stream plus their durations —
  * the measurement behind the replay-harness floor work (r12). Not part
  * of the driver contract.
  *
  * Usage: runMain graft.tools.ReplayProbe <sfDir> [slices] [q1,q2,…]
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1,
      "usage: runMain graft.tools.ReplayProbe <sfDir> [slices] [q1,q2,…]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.replay.slices", args.lift(1).getOrElse("2"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val batches = new java.util.concurrent.ConcurrentHashMap[String,
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        batches.computeIfAbsent(p.name,
          _ => scala.collection.mutable.ArrayBuffer.empty)
          .append((p.batchId, p.numInputRows, p.batchDuration))
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    graft.Tables.events(spark, sfDir).cache().count()
    val names = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q_stream_tumbling", "q_stream_totals",
        "q_stream_dedup", "q_stream_join"))
    for (name <- names; pass <- 1 to 2) {
      batches.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      for ((sink, bs) <- batches.asScala) {
        val detail = bs.sortBy(_._1)
          .map { case (id, rows, ms) => s"b$id:${rows}r/${ms}ms" }
          .mkString(" ")
        println(f"[probe] $name pass$pass: $dt%.2f s, " +
          s"${bs.length} batches [$detail]")
      }
    }
    spark.stop()
  }
}
