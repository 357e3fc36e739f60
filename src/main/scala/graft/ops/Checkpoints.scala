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
        // `dir`: setCheckpointDir stores `<qualified dir>/<random-uuid>`
        // (e.g. file:/…), so the stored root's PARENT is compared —
        // as a fully-qualified Hadoop Path, not a string suffix (a
        // suffix match false-positives when the new conf value is a
        // path-suffix of the old root, e.g. /tmp/x/y → /x/y, silently
        // keeping checkpoints in the stale root; ADVICE r9). Qualifying
        // `dir` through its FileSystem mirrors exactly what
        // setCheckpointDir itself stores. Without the guard every
        // loop-round materialization would mkdirs a fresh uuid
        // directory — one driver→namenode round-trip per round,
        // checkpoint files scattered across uuid dirs.
        val wantPath = new org.apache.hadoop.fs.Path(dir)
        val wantQ = wantPath.getFileSystem(sc.hadoopConfiguration)
          .makeQualified(wantPath)
        val currentRoot = sc.getCheckpointDir
          .map(p => new org.apache.hadoop.fs.Path(p).getParent)
        if (!currentRoot.contains(wantQ))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}
