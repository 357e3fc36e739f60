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
    // generation bookkeeping: the pointer names the new live generation,
    // the just-retired one stays for in-flight readers, nothing older
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(Similarity.resolveCodesPath(spark, dir).getName
      === "codes_v2.parquet")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codes.parquet")),
      "the retired generation must survive one flip for in-flight readers")
    // a second compaction flips to v3 and expires the v1 generation
    Similarity.compactCodes(spark, dir, Seq("cluster"))
    assert(Similarity.resolveCodesPath(spark, dir).getName
      === "codes_v3.parquet")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codes.parquet")),
      "generations two flips old must be expired")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codes_v2.parquet")))
    val post2 = Similarity.loadCodes(spark, dir)
      .select("vec_id", "cluster").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(post2 === pre)
  }

  test("codes manifest: mismatched partitionCols or drifted schema fails loud") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val emb = graft.Tables.embeddings(spark, Sf001)
    val (assigned, _) = Similarity.ivfAssign(spark, emb, nCells = 8)
    val narrow = assigned.select("vec_id", "cluster")
    val dir = graft.util.TempDirs.scratch("graft-ann-layout-").toString
    val a = narrow.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b = narrow.filter(pmod(col("vec_id"), lit(2)) === 1)
    Similarity.saveCodes(a, dir, Seq("cluster"))
    // unpartitioned append into a cell-partitioned table: mixed layout
    intercept[IllegalArgumentException] {
      Similarity.appendCodes(b, dir, Nil)
    }
    // append partitioned by a DIFFERENT column: mixed layout
    intercept[IllegalArgumentException] {
      Similarity.appendCodes(b, dir, Seq("vec_id"))
    }
    // schema drift: renamed column / extra column
    intercept[IllegalArgumentException] {
      Similarity.appendCodes(b.withColumnRenamed("vec_id", "id"),
        dir, Seq("cluster"))
    }
    intercept[IllegalArgumentException] {
      Similarity.appendCodes(b.withColumn("extra", lit(1)),
        dir, Seq("cluster"))
    }
    // compaction with the wrong layout fails the same way
    intercept[IllegalArgumentException] {
      Similarity.compactCodes(spark, dir, Nil)
    }
    // the matching append still works, and nothing above landed
    Similarity.appendCodes(b, dir, Seq("cluster"))
    assert(Similarity.loadCodes(spark, dir).count()
      === narrow.count())
  }

  test("legacy crash state self-heals: stranded __compact_old__ recovers") {
    // a PRE-POINTER compaction that died between rename(live->old) and
    // rename(tmp->live) left the complete table at __compact_old__ and
    // no live path (ADVICE r10) — resolve must rename it back
    val emb = graft.Tables.embeddings(spark, Sf001)
    val dir = graft.util.TempDirs.scratch("graft-ann-heal-").toString
    val narrow = emb.select("vec_id")
    // write WITHOUT saveCodes: legacy tables have no pointer/manifest
    narrow.write.parquet(s"$dir/codes.parquet")
    val n = narrow.count()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/codes.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/codes.parquet.__compact_old__")))
    assert(Similarity.loadCodes(spark, dir).count() === n)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codes.parquet")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/codes.parquet.__compact_old__")))
  }

  test("compaction is reader-safe: concurrent reads never fail or tear") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val emb = graft.Tables.embeddings(spark, Sf001)
    val (assigned, _) = Similarity.ivfAssign(spark, emb, nCells = 8)
    val dir = graft.util.TempDirs.scratch("graft-ann-rdrsafe-").toString
    val narrow = assigned.select("vec_id", "cluster")
    (0 until 4).foreach { b =>
      val batch = narrow.filter(pmod(col("vec_id"), lit(4)) === b)
      if (b == 0) Similarity.saveCodes(batch, dir, Seq("cluster"))
      else Similarity.appendCodes(batch, dir, Seq("cluster"))
    }
    val expected = Similarity.loadCodes(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    @volatile var done = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!done) {
        try {
          // resolve + scan, exactly what a probe does — during a swap it
          // must land on the old-complete or new-complete generation
          val got = Similarity.loadCodes(spark, dir)
            .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
          if (got != expected)
            failures.add(s"torn read: ${got.length}/${expected.length} rows")
          reads.incrementAndGet()
        } catch {
          case e: Throwable => failures.add(e.toString); done = true
        }
      }
    })
    reader.start()
    try (0 until 3).foreach { _ =>
      Similarity.compactCodes(spark, dir, Seq("cluster"))
    } finally {
      done = true
      reader.join(120000)
    }
    assert(failures.isEmpty,
      s"concurrent reads failed during compaction: $failures")
    // anti-vacuity: the reader must actually have overlapped the swaps
    assert(reads.get >= 5, s"reader finished only ${reads.get} reads")
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
