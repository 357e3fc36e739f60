package graft.ops

import graft.SparkSpec
import scala.jdk.CollectionConverters._

/** The checkpoint-routing contract (VERDICT r8 item 5): iterative-loop
  * results are identical whether the loop materializes with
  * localCheckpoint (default — executor-pinned, fast, NOT fault-tolerant)
  * or with a reliable checkpoint dir (`graft.checkpoint.dir` — survives
  * executor loss, the 100 TB setting). Also pins the loop-width contract:
  * `graft.graph.loopWidth=session` (the web-scale setting) changes
  * nothing but the exchange width, and the scoped width never leaks into
  * the session conf. */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def pr() = {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 1L), (5L, 2L)).toDF("a", "b")
    Graph.pageRank(edges, "a", "b", iters = 4, segSize = 2)
      .as[(Long, Long, Double)].collect().toSet
  }

  private def cc() = {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 12L))
      .toDF("a", "b")
    Dedup.components(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
  }

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("pageRank + components: reliable checkpoint dir ≡ localCheckpoint") {
    val local = (pr(), cc())
    val dir = graft.util.TempDirs.scratch("graft-ckpt-spec-").toString
    val reliable = withConf(Checkpoints.DirKey, dir)((pr(), cc()))
    assert(reliable === local)
    // the reliable run actually wrote checkpoint blocks
    val wrote = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try assert(wrote.iterator().hasNext,
      "reliable mode left the checkpoint dir empty — it never routed")
    finally wrote.close()
  }

  test("reliable mode reuses ONE uuid dir across materializations") {
    // setCheckpointDir stores <dir>/<uuid>; the same-dir guard must
    // recognize the configured root through that uuid leaf, or every
    // loop-round materialization re-runs setCheckpointDir — a fresh
    // mkdirs round-trip per round and checkpoints scattered across uuid
    // dirs (the round-9 review finding this test pins).
    val dir = graft.util.TempDirs.scratch("graft-ckpt-reuse-").toString
    withConf(Checkpoints.DirKey, dir) {
      Checkpoints.materialize(Seq(1L).toDF("x")).count()
      val after1 = spark.sparkContext.getCheckpointDir
      Checkpoints.materialize(Seq(2L).toDF("x")).count()
      Checkpoints.materialize(Seq(3L).toDF("x")).count()
      assert(spark.sparkContext.getCheckpointDir === after1,
        "a later materialize re-ran setCheckpointDir (guard not matching)")
      val roots = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try assert(roots.iterator().asScala.size === 1,
        "expected exactly one uuid dir under the configured root")
      finally roots.close()
    }
  }

  test("conf change to a path-suffix of the old root still re-routes") {
    // ADVICE r9: the old guard matched the stored root by STRING suffix,
    // so changing the conf from /a/x/y to a dir whose path is a suffix
    // of the old root (e.g. /x/y) skipped setCheckpointDir and
    // checkpoints silently kept landing in the stale root. The guard now
    // compares qualified Hadoop Paths. Construct the hazard exactly:
    // oldDir literally ends with newDir's slash-stripped path.
    val newDir =
      s"${graft.util.TempDirs.scratch("graft-ckpt-sfx-new-")}/ckroot"
    val oldDir =
      s"${graft.util.TempDirs.scratch("graft-ckpt-sfx-old-")}$newDir"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(oldDir))
    withConf(Checkpoints.DirKey, oldDir) {
      Checkpoints.materialize(Seq(1L).toDF("x")).count()
    }
    val stale = spark.sparkContext.getCheckpointDir.get
    assert(stale.contains(oldDir))
    withConf(Checkpoints.DirKey, newDir) {
      Checkpoints.materialize(Seq(2L).toDF("x")).count()
    }
    val p = new org.apache.hadoop.fs.Path(newDir)
    val wantQ = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p)
    assert(new org.apache.hadoop.fs.Path(
      spark.sparkContext.getCheckpointDir.get).getParent === wantQ,
      "suffix-shadowed conf change did not re-route the checkpoint root")
  }

  test("loopWidth=session ≡ default width, and no conf leak either way") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val defaultWidth = pr()
    val sessionWidth = withConf("graft.graph.loopWidth", "session")(pr())
    val explicit = withConf("graft.graph.loopWidth", "2")(pr())
    assert(sessionWidth === defaultWidth)
    assert(explicit === defaultWidth)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
  }
}
