package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: time a named query and dump its formatted physical plan.
  * Usage: runMain graft.tools.Explain <sfDir> <queryName> [explain]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s (run 1)")
    val t1 = System.nanoTime()
    df.count()
    println(f"[explain] $name: second run ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
