package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import scala.jdk.OptionConverters._

/** Executor-loss fault-tolerance gate — the step after [[ClusterGate]]'s
  * multi-process proof: at 100 TB executors die (preemption, OOM killers,
  * hardware), and the engine's plans must produce the SAME answer
  * through task retries, stage resubmission on FetchFailed (the dead
  * executor's shuffle files are gone), and reliable-checkpoint recovery
  * of iterative loops.
  *
  * Shape: baseline results on `local[8]`, then a
  * `local-cluster[2,4,2048]` session with `graft.checkpoint.dir` set (so
  * [[graft.ops.Checkpoints.materialize]] routes loop state through
  * RELIABLE checkpoints — localCheckpoint blocks on a killed executor
  * are unrecoverable by design, which is exactly why the knob exists)
  * while a chaos thread `destroyForcibly`s one live
  * CoarseGrainedExecutorBackend process every ~1.5 s. Each query runs
  * three times under that fire; every result must equal the baseline
  * bit-exactly. The gate fails if NO executor was actually lost
  * (SparkListenerExecutorRemoved count — a vacuous pass is impossible)
  * and relies on the standalone worker relaunching executors between
  * kills (so the application itself survives).
  *
  * Query set: the reliable-checkpointed iterative loops (pagerank,
  * components), a broadcast-join rollup, a shuffle aggregation, and the
  * MinHash LSH chain — the shapes whose retry/recovery semantics differ.
  *
  * Usage:
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 sbt -batch \
  *     "runMain graft.tools.FaultGate /root/testdata/sf0.01"
  * Exits nonzero on any divergence, error, or if no executor died.
  */
object FaultGate {

  val Queries: Seq[String] = Seq(
    "q_pagerank", "q_cc_labels", "q_monthly_rollup", "q_groupby_median",
    "q_dedup_minhash")

  private val RunsPerQuery = 3

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val queries: Seq[String] =
      if (args.length > 1)
        args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Queries

    val baseline = ClusterGate.runPass("local[8]", cluster = false,
      sfDir, queries)

    val b = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    ClusterGate.clusterConfs(b)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val removed = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(
          e: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet()
        println(s"[fault-gate] executor ${e.executorId} removed: ${e.reason}")
      }
    })
    var bad = 0
    val stop = new AtomicBoolean(false)
    val kills = new AtomicInteger(0)
    val killer = new Thread(() => {
      while (!stop.get()) {
        Thread.sleep(1500)
        if (!stop.get()) executorProcess().foreach { ph =>
          if (ph.destroyForcibly()) {
            kills.incrementAndGet()
            println(s"[fault-gate] killed executor pid ${ph.pid()}")
          }
        }
      }
    }, "fault-gate-killer")
    killer.setDaemon(true)
    try {
      ClusterGate.awaitExecutors(spark, 2)
      // iterative loops must recover from a shared-FS checkpoint, not
      // executor-resident localCheckpoint blocks that die with the JVM
      spark.conf.set("graft.checkpoint.dir",
        graft.util.TempDirs.scratch("graft-fault-ckpt-").toString)
      killer.start()
      queries.foreach { q =>
        val expect = baseline(q)
        (1 to RunsPerQuery).foreach { i =>
          val got =
            try Right(ClusterGate.canon(
              graft.SparkEntry.queries(q)(spark, sfDir)))
            catch { case e: Throwable =>
              Left(s"${e.getClass.getSimpleName}: " +
                String.valueOf(e.getMessage).take(160))
            }
          val ok = got == expect
          if (!ok) bad += 1
          println(s"[fault-gate] $q run $i/$RunsPerQuery " +
            (if (ok) "OK" else s"DIVERGED ($got vs $expect)"))
        }
      }
    } finally {
      stop.set(true)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    println(s"[fault-gate] ${queries.size * RunsPerQuery - bad}/" +
      s"${queries.size * RunsPerQuery} runs identical to baseline under " +
      s"${kills.get()} executor kills (${removed.get()} removals observed)")
    if (removed.get() == 0) {
      println("[fault-gate] FAIL: no executor was actually lost — vacuous")
      sys.exit(1)
    }
    if (bad > 0) sys.exit(1)
  }

  /** A live executor JVM (same user). Scans /proc cmdline directly:
    * ProcessHandle.Info.commandLine comes back EMPTY for the executor
    * JVMs — their command line (a full-classpath java invocation) blows
    * past the JDK's per-process info limit — so the match must read
    * /proc/<pid>/cmdline itself (Linux-only, like the gate). */
  private def executorProcess(): Option[ProcessHandle] =
    new java.io.File("/proc").listFiles().toSeq
      .filter(f => f.getName.nonEmpty && f.getName.forall(_.isDigit))
      .filter { f =>
        try new String(java.nio.file.Files.readAllBytes(
            f.toPath.resolve("cmdline")),
          java.nio.charset.StandardCharsets.US_ASCII)
          .contains("CoarseGrainedExecutorBackend")
        catch { case _: Throwable => false }
      }
      .flatMap(f => ProcessHandle.of(f.getName.toLong).toScala)
      .find(_.isAlive)
}
