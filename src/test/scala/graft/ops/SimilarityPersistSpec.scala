package graft.ops

import graft.SparkSpec

/** ANN index persistence round-trip at the artifact level (the
  * q_ann_persist gate proves loaded-index ANSWERS match; this pins the
  * artifacts themselves — arrays round-trip parquet bit-exactly). */
class SimilarityPersistSpec extends SparkSpec {

  test("IVF centroids, PQ codebooks, and codes round-trip exactly") {
    val emb = graft.Tables.embeddings(spark, Sf001)
    val (assigned, centroids) = Similarity.ivfAssign(spark, emb, nCells = 8)
    val books = Similarity.pqTrain(spark, emb, m = 8, k = 8)
    val encoded = Similarity.pqEncode(spark, assigned, books)
    val dir = graft.util.TempDirs.scratch("graft-ann-spec-").toString
    Similarity.saveCentroids(spark, dir, centroids)
    Similarity.saveCodebooks(spark, dir, books)
    Similarity.saveCodes(encoded.select("vec_id", "cluster", "code"), dir)

    val lc = Similarity.loadCentroids(spark, dir)
    assert(lc.length === centroids.length)
    lc.zip(centroids).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }

    val lb = Similarity.loadCodebooks(spark, dir)
    assert(lb.length === books.length)
    lb.zip(books).foreach { case (sa, sb) =>
      assert(sa.length === sb.length)
      sa.zip(sb).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    }

    val back = Similarity.loadCodes(spark, dir)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    val orig = encoded.select("vec_id", "cluster", "code")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    assert(back.toSeq === orig.toSeq)
  }

  test("codebook manifest fails the load on truncation and wrong shape") {
    val emb = graft.Tables.embeddings(spark, Sf001)
    val books = Similarity.pqTrain(spark, emb, m = 4, k = 8)
    val dir = graft.util.TempDirs.scratch("graft-ann-manifest-").toString
    Similarity.saveCodebooks(spark, dir, books)
    // intact round-trip still loads
    assert(Similarity.loadCodebooks(spark, dir).length === 4)
    // simulate partial parquet loss: drop the LAST subspace's rows —
    // subspaces 0..2 stay contiguous, so before the manifest this load
    // silently succeeded with a 3-book index (ADVICE r9)
    val kept = spark.read.parquet(s"$dir/codebooks.parquet")
      .filter(org.apache.spark.sql.functions.col("subspace") < 3)
    val dir2 = graft.util.TempDirs.scratch("graft-ann-manifest2-").toString
    kept.repartition(1).write.mode("overwrite")
      .parquet(s"$dir2/codebooks.parquet")
    spark.read.parquet(s"$dir/codebooks_manifest.parquet")
      .write.mode("overwrite").parquet(s"$dir2/codebooks_manifest.parquet")
    intercept[IllegalArgumentException] {
      Similarity.loadCodebooks(spark, dir2)
    }
    // truncation WITHIN a subspace (trailing codewords lost) also fails
    val dir3 = graft.util.TempDirs.scratch("graft-ann-manifest3-").toString
    spark.read.parquet(s"$dir/codebooks.parquet")
      .filter(!(org.apache.spark.sql.functions.col("subspace") === 3 &&
        org.apache.spark.sql.functions.col("codeword") === 7))
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir3/codebooks.parquet")
    spark.read.parquet(s"$dir/codebooks_manifest.parquet")
      .write.mode("overwrite").parquet(s"$dir3/codebooks_manifest.parquet")
    intercept[IllegalArgumentException] {
      Similarity.loadCodebooks(spark, dir3)
    }
  }

  test("compaction: fewer files, identical content, pruning still holds") {
    val emb = graft.Tables.embeddings(spark, Sf001)
    val (assigned, _) = Similarity.ivfAssign(spark, emb, nCells = 8)
    val dir = graft.util.TempDirs.scratch("graft-ann-compact-spec-").toString
    val narrow = assigned.select("vec_id", "cluster")
    // the append-only nightly shape: four batches, four file sets
    (0 until 4).foreach { b =>
      val batch = narrow.filter(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.lit(4)) === b)
      if (b == 0) Similarity.saveCodes(batch, dir, Seq("cluster"))
      else Similarity.appendCodes(batch, dir, Seq("cluster"))
    }
    val before = Similarity.codesFileCount(spark, dir)
    val pre = Similarity.loadCodes(spark, dir)
      .select("vec_id", "cluster").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    Similarity.compactCodes(spark, dir, Seq("cluster"))
    val after = Similarity.codesFileCount(spark, dir)
    assert(after < before,
      s"compaction did not reduce file count ($before -> $after)")
    // one file per non-empty cell directory — the bin-pack target
    val nCellsUsed = pre.map(_._2).distinct.length
    assert(after === nCellsUsed.toLong)
    val post = Similarity.loadCodes(spark, dir)
      .select("vec_id", "cluster").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(post === pre)
    // partition pruning survives the rewrite
    val probed = Similarity.loadCodes(spark, dir).filter(
      org.apache.spark.sql.functions.col("cluster").isInCollection(Seq(0, 3)))
    val scan = probed.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined && scan.get.partitionFilters.nonEmpty)
    // no swap debris left behind
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/codes.parquet.__compact_tmp__")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/codes.parquet.__compact_old__")))
  }

  test("cell-partitioned codes: the probe's cell filter partition-prunes") {
    val emb = graft.Tables.embeddings(spark, Sf001)
    val (assigned, _) = Similarity.ivfAssign(spark, emb, nCells = 8)
    val dir = graft.util.TempDirs.scratch("graft-ann-part-").toString
    Similarity.saveCodes(assigned.select("vec_id", "cluster", "embedding"),
      dir, partitionCols = Seq("cluster"))
    val loaded = Similarity.loadCodes(spark, dir)
    // content identical to the unpartitioned frame (column order moves,
    // values don't; the partition column reads back as int)
    val a = loaded.select("vec_id", "cluster").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val b = assigned.select("vec_id", "cluster").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(a === b)
    // the cell filter lands as a PARTITION filter — whole directories
    // prune at the scan, which at 100 TB is the difference between
    // reading nProbe/nCells of the files vs scanning everything
    val probed = loaded.filter(org.apache.spark.sql.functions
      .col("cluster").isInCollection(Seq(0, 3)))
    val scan = probed.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined)
    assert(scan.get.partitionFilters.nonEmpty,
      "cluster filter did not reach the scan as a partition filter")
    assert(probed.select("cluster").distinct().collect()
      .map(_.getInt(0)).toSet.subsetOf(Set(0, 3)))
  }
}
