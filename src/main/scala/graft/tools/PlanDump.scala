package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: dump `.explain("formatted")` for a set of registered queries
  * to one text file each — the r11 optimization round's plan evidence
  * (`plans/r11/<query>_{before,after}.txt`). One JVM for the whole list
  * (a per-query `Explain` run pays ~40 s of sbt+SparkSession start each).
  *
  * The streaming replays are skipped for the same reason PlanSweep skips
  * them: building one EXECUTES its stream and the returned frame is the
  * memory sink's LocalTableScan — no batch plan to dump. Queries whose
  * build phase runs side-effect actions (the ANN persistence gates) still
  * dump fine; they are just slower to build.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1,q2,…]
  *   suffix: "before" / "after" — appended as `_<suffix>.txt`.
  *   With no query list, dumps every non-streaming registered query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1,q2,…]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val names: Seq[String] =
      if (args.length > 3)
        args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    var failed = 0
    for (name <- names) {
      if (name.startsWith("q_stream_")) {
        System.err.println(s"[plandump] skip (streaming replay): $name")
      } else {
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          // queryExecution.explainString is exactly what explain("formatted")
          // prints, captured instead of written to stdout
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val f = outDir.resolve(s"${name}_$suffix.txt")
          java.nio.file.Files.write(f,
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          System.err.println(s"[plandump] wrote $f")
        } catch {
          case e: Throwable =>
            failed += 1
            System.err.println(s"[plandump] FAIL $name: ${e.getMessage}")
        }
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
