package graft.ops

import org.apache.spark.sql.DataFrame

/** Checkpoint routing for the iterative loops (Graph / Dedup / BPE).
  *
  * Default: `localCheckpoint` — blocks pin to EXECUTOR storage, which is
  * the right trade on local[32] and for short loops (no distributed-FS
  * round-trip per round), but is NOT fault-tolerant: on a real cluster an
  * executor loss mid-loop kills the computation, because the truncated
  * lineage cannot be replayed.
  *
  * Set `graft.checkpoint.dir` (session conf) to a reliable location
  * (HDFS/S3 path) to route every loop materialization through a RELIABLE
  * `Dataset.checkpoint` instead: blocks are written to the checkpoint
  * dir, so the loop survives executor loss — the setting a 100 TB
  * cluster run uses. Results are bit-identical either way (the loops'
  * values are materialization-invariant; CheckpointSpec proves it on
  * pageRank + components); only the fault-tolerance/latency trade moves.
  * Checkpoint files accumulate per rdd — deployments reclaim them with
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` or by owning
  * the directory's lifecycle.
  */
object Checkpoints {

  final val DirKey = "graft.checkpoint.dir"

  /** Eagerly materialize `df`, truncating lineage — local or reliable per
    * [[DirKey]]. Both paths run through `Dataset`'s action wrapper, so
    * `observe`d metrics on `df` fire either way (the one-job
    * count-rides-the-checkpoint pattern in [[Graph.checkpointWithCount]]
    * keeps working in both modes). */
  def materialize(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // Skip the re-set when the current checkpoint root is already
        // `dir`: setCheckpointDir stores `<dir>/<random-uuid>` (qualified,
        // e.g. file:/…), so the comparison strips the uuid LEAF and then
        // matches `dir` as a whole path-suffix component (a bare endsWith
        // would let a previous dir like /a/mydir shadow a new conf value
        // "mydir"; stripPrefix("/") avoids the double-slash miss for
        // absolute values). Without the guard every loop-round
        // materialization would mkdirs a fresh uuid directory — one
        // driver→namenode round-trip per round, checkpoint files
        // scattered across uuid dirs.
        val want = dir.stripSuffix("/")
        val currentRoot = sc.getCheckpointDir.map(_.stripSuffix("/"))
          .map(d => d.take(math.max(0, d.lastIndexOf('/'))))
        if (!currentRoot.exists(p =>
            p == want || p.endsWith("/" + want.stripPrefix("/"))))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}
