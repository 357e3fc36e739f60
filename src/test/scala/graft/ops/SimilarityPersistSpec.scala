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
