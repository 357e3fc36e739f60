package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CosineSim.cosine_sim

/** Similarity search over an embedding column (SURVEY §2b E3).
  *
  * Baseline: brute-force cosine top-k — one scan, no shuffle except the
  * final k-row TakeOrdered merge; the probe travels as a literal (a
  * broadcast in cluster terms). This is the exact answer and the oracle.
  *
  * Scale path: IVF (inverted-file) — k-means coarse quantizer partitions
  * the corpus; a probe searches only the nProbe nearest cells. At 100 TB
  * the assignment is a one-time write-side cost (cluster id becomes a
  * partition column) and each query prunes to nProbe/k of the data.
  */
object Similarity {

  /** Embedding column (array<float>) widened to array<double> — all scoring
    * runs in double so results are engine-portable (float widening exact). */
  def asDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(c, x => x.cast("double"))

  /** In-plan NULL-embedding guard — the [[ivfAssign]]/[[pqTrain]] domain
    * contract extended to the codegen'd assignment paths: an assignment
    * cannot place a MISSING vector, and silently dropping (or seating it
    * under an arbitrary centroid, which is what a min-over-NULL-distance
    * struct would do) hides data loss. Zero extra passes: the check rides
    * the existing projection and raises at first NULL row. */
  private[graft] def requireVec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.isNull, raise_error(lit(
      "corpus contains NULL embeddings — an assignment cannot place a " +
        "missing vector; filter or impute upstream")).cast("array<double>"))
      .otherwise(c)

  /** Fetch one probe vector (as doubles) by id — a driver-side scalar fetch
    * of a query *parameter*, not a data collect. An ABSENT probe id is a
    * domain error (top-k relative to no vector has no defined answer —
    * the DegenGate `empty`-corpus expectation documents it); fail with
    * the reason, not `head of empty array`. */
  def probeVector(emb: DataFrame, idCol: String, id: Long): Seq[Double] = {
    val rows = emb.filter(col(idCol) === id)
      .select(asDouble(col("embedding")).as("p"))
      .take(1)
    require(rows.nonEmpty,
      s"probe $idCol=$id is absent from the corpus — top-k relative to " +
        "no vector is undefined")
    rows(0).getSeq[Double](0)
  }

  /** Brute-force cosine top-k against a literal probe vector.
    * `carryCols` names the payload columns carried through to the result
    * (default the test tables' `label`); pass `Nil` for a frame that has
    * only (idCol, embedding) — the ops make no other column assumption. */
  def bruteForceTopK(emb: DataFrame, idCol: String, probe: Seq[Double],
      k: Int, excludeId: Option[Long] = None,
      carryCols: Seq[String] = Seq("label")): DataFrame = {
    val p = array(probe.map(lit): _*)
    val base = excludeId.fold(emb)(x => emb.filter(col(idCol) =!= x))
    base
      .withColumn("cos", round(cosine_sim(asDouble(col("embedding")), p), 6))
      .select(col(idCol) +: carryCols.map(col) :+ col("cos"): _*)
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF index: coarse k-means quantizer + full-corpus assignment.
    *
    * Faiss shape taken literally: the quantizer trains on a BOUNDED
    * sample (256·nCells vectors) at the DRIVER — quantizer training is a
    * small local job everywhere (nobody k-means 100 TB; the sample is a
    * few MB), and a local seeded Lloyd's is exactly reproducible on ANY
    * cluster layout. The previous MLlib fit was parallelism-dependent
    * twice over (Bernoulli sampling draws per-partition streams; random
    * init + float aggregation order follow the partition layout), which
    * made IVF recall change with the session's core count. Only the
    * per-row nearest-centroid ASSIGNMENT is distributed — one map pass,
    * no shuffle, centroids broadcast in the task closure.
    *
    * Sample selection is a pure key-hash filter (not `.sample()`, not
    * `limit()`): deterministic on any layout, unbiased by ingest order. */
  def ivfAssign(spark: SparkSession, emb: DataFrame, nCells: Int,
      idCol: String = "vec_id"): (DataFrame, Array[Array[Double]]) = {
    val maxTrain = 256L * nCells
    val n = emb.count()
    val sampleDf =
      (if (n > maxTrain) {
        // ceil + floor-of-1: plain truncation would undershoot the
        // 256·nCells target and hit ZERO once n ≥ 1e6·maxTrain — i.e.
        // exactly the huge-corpus case this sampling exists for.
        val keep = math.max(1L, math.ceil(maxTrain.toDouble / n * 1000000L).toLong)
        emb.filter(pmod(xxhash64(lit("ivf-train"), col(idCol)), lit(1000000L)) < keep)
      } else emb)
        .select(col(idCol), asDouble(col("embedding")).as("__v"))
    // Sort at the DRIVER: the sample is about to be collected anyway, and
    // a distributed orderBy would pay a range-sampling pass + sort shuffle
    // just to fix iteration order for the local fit.
    val sampleRows = sampleDf.collect()
    require(sampleRows.forall(!_.isNullAt(1)),
      "corpus contains NULL embeddings — an ANN index cannot represent a " +
        "missing vector; filter or impute upstream")
    val sample = sampleRows
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val centroids = localKMeans(sample, nCells, iters = 10, seed = 42L)
    (ivfAssignWith(spark, emb, centroids), centroids)
  }

  /** Assign `emb` to an EXISTING quantizer — the incremental-maintenance
    * half of the persistence story: a deployment trains centroids once
    * ([[ivfAssign]]), persists them ([[saveCentroids]]), and each new
    * ingest batch is assigned against the LOADED quantizer — no
    * retraining, no count(), no sample collect. Codegen'd assignment:
    * the centroid table ships as a plan reference object and the argmin
    * runs inside whole-stage codegen — no row-wise mapPartitions, no
    * InternalRow→Row round-trip, the pipeline stays fused from the
    * parquet scan through the cluster-id projection. */
  def ivfAssignWith(spark: SparkSession, emb: DataFrame,
      centroids: Array[Array[Double]]): DataFrame =
    graft.Tables.fanOut(spark, emb)
      .withColumn("cluster",
        graft.functions.NearestCentroid.nearest_centroid(
          asDouble(col("embedding")), centroids))

  /** Index of the squared-L2-nearest centroid — delegates to the ONE
    * metric kernel [[graft.functions.NearestCentroid.compute]] shared by
    * quantizer training and the codegen'd corpus assignment (divergence
    * between the two would silently skew cell populations). */
  private[ops] def nearestCentroid(v: Array[Double], centroids: Array[Array[Double]]): Int =
    graft.functions.NearestCentroid.compute(v, centroids)

  /** Seeded local Lloyd's k-means (euclidean) over a bounded sample —
    * the quantizer trainer. Deterministic: init picks k sample points by
    * a seeded shuffle of the (sorted) sample, iteration order is the
    * array order, empty clusters keep their previous centroid. */
  private[ops] def localKMeans(sample: Array[Array[Double]], k: Int,
      iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty quantizer training sample")
    val dim = sample.head.length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(sample.indices.toVector).take(math.min(k, sample.length))
    val centroids = Array.tabulate(math.min(k, sample.length))(i => sample(init(i)).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val best = nearestCentroid(v, centroids)
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < centroids.length) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
    }
    centroids
  }

  /** The LSH-bucketed ANN variant: BucketedRandomProjectionLSH (euclidean
    * family — for unit-norm embeddings euclidean and cosine order agree up
    * to monotone transform). `approxNearestNeighbors` prunes to colliding
    * hash buckets; at 100 TB the hash columns are precomputed write-side
    * and candidate generation is a bucket equi-join (same shape as
    * Dedup.lshBands). Seeded; returns (idCol, label, dist) top-k by
    * euclidean distance. */
  def lshTopK(spark: SparkSession, emb: DataFrame, idCol: String,
      probe: Seq[Double], k: Int, excludeId: Option[Long] = None,
      carryCols: Seq[String] = Seq("label")): DataFrame = {
    val withVec = graft.Tables.fanOut(spark, emb)
      .withColumn("__vec", array_to_vector(asDouble(col("embedding"))))
    val base = excludeId.fold(withVec)(x => withVec.filter(col(idCol) =!= x))
    // an EMPTY corpus (degen corpora): MLlib cannot fit a hash family on
    // zero rows ("head of empty array") — the total answer is no neighbors
    if (base.limit(1).count() == 0)
      return base.select(col(idCol) +: carryCols.map(col)
        :+ lit(null).cast("double").as("dist"): _*)
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0)
      .setNumHashTables(4)
      .setSeed(42L)
      .setInputCol("__vec")
      .setOutputCol("__hashes")
    val model = lsh.fit(base)
    model.approxNearestNeighbors(base, Vectors.dense(probe.toArray), k, "dist")
      .select(col(idCol) +: carryCols.map(col)
        :+ round(col("dist"), 6).as("dist"): _*)
      .orderBy(col("dist").asc, col(idCol).asc)
  }

  /** IVF query: score only the nProbe cells whose centroids are nearest
    * the probe, then brute-force inside them. Cell selection uses the
    * SAME squared-L2 metric [[nearestCentroid]] assigned the corpus with —
    * ranking probe cells by a different metric (an earlier version used
    * cosine) can exclude the very cell holding the true neighbors
    * whenever centroid norms differ, which they always do (centroids are
    * means, never unit-norm). Standard IVF probes with the assignment
    * metric for exactly this reason. */
  /** The nProbe cell ids nearest the probe by the ASSIGNMENT metric
    * (squared L2), ties to the lower cell id — driver-side over the
    * (tiny) centroid table, shared by every IVF-probed query path. */
  private def probeCells(centroids: Array[Array[Double]],
      probe: Seq[Double], nProbe: Int): Seq[Int] = {
    def d2(a: Seq[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < b.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    centroids.zipWithIndex
      .map { case (c, i) => (i, d2(probe, c)) }
      .sortBy { case (i, s) => (s, i) }
      .take(nProbe).map(_._1).toSeq
  }

  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
      idCol: String, probe: Seq[Double], k: Int, nProbe: Int,
      excludeId: Option[Long] = None,
      carryCols: Seq[String] = Seq("label")): DataFrame = {
    val cells = probeCells(centroids, probe, nProbe)
    val p = array(probe.map(lit): _*)
    val base = excludeId.fold(assigned)(x => assigned.filter(col(idCol) =!= x))
    base
      .filter(col("cluster").isInCollection(cells))
      .withColumn("cos", round(cosine_sim(asDouble(col("embedding")), p), 6))
      .select(col(idCol) +: carryCols.map(col)
        :+ col("cluster") :+ col("cos"): _*)
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Product-quantization codebooks (Jégou et al. 2011, "Product
    * quantization for nearest neighbor search" — the Faiss IVF-PQ
    * compression half): the vector space splits into `m` subspaces and
    * each gets its own `k`-codeword quantizer, so a full vector encodes
    * as `m` small ints — m bytes instead of 4·dim, a 32× compression at
    * dim 64 / m 8. Trains on the SAME bounded layout-independent
    * key-hash sample as [[ivfAssign]] (a codebook is a few KB; nobody
    * k-means the corpus), per-subspace seeds differ so subspaces don't
    * share degenerate inits. Returns codebooks(s)(c) = codeword c of
    * subspace s. */
  def pqTrain(spark: SparkSession, emb: DataFrame, m: Int, k: Int,
      idCol: String = "vec_id"): Array[Array[Array[Double]]] = {
    val maxTrain = 256L * k
    val n = emb.count()
    val sampleDf =
      (if (n > maxTrain) {
        val keep = math.max(1L, math.ceil(maxTrain.toDouble / n * 1000000L).toLong)
        emb.filter(pmod(xxhash64(lit("pq-train"), col(idCol)), lit(1000000L)) < keep)
      } else emb)
        .select(col(idCol), asDouble(col("embedding")).as("__v"))
    val sampleRows = sampleDf.collect()
    require(sampleRows.forall(!_.isNullAt(1)),
      "corpus contains NULL embeddings — an ANN index cannot represent a " +
        "missing vector; filter or impute upstream")
    val sample = sampleRows
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val subSample = sample.map(v =>
        java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      localKMeans(subSample, k, iters = 10, seed = 42L + s)
    }
  }

  /** PQ encode: one `code` column (array<int>, length m) per vector —
    * each entry the nearest codeword of that subspace, via the SAME
    * codegen'd [[graft.functions.NearestCentroid]] argmin the IVF
    * assignment uses (slice + argmin per subspace, all inside
    * whole-stage codegen). At 100 TB this is the write-side pass that
    * makes the ANN scan read m bytes per vector instead of the full
    * embedding. */
  def pqEncode(spark: SparkSession, emb: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id"): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    graft.Tables.fanOut(spark, emb)
      .withColumn("code", array((0 until m).map { s =>
        graft.functions.NearestCentroid.nearest_centroid(
          slice(asDouble(col("embedding")), s * sub + 1, sub), codebooks(s))
      }: _*))
  }

  /** PQ query: asymmetric-distance (ADC) scan + exact re-rank — the
    * production two-stage shape. Stage 1 computes, per subspace, the
    * squared-L2 lookup table probe-subvector × codeword at the DRIVER
    * (m·k doubles), embeds it as literal arrays, and scores every code
    * as Σ_s lut[s][code_s] — a pure column expression over the m-byte
    * code column only (the full embedding is never touched, which at
    * 100 TB is the difference between scanning 3 TB of codes and 100 TB
    * of vectors). Stage 2 re-ranks the `shortlist` ADC survivors by
    * exact squared L2 on their real vectors — only shortlist-many full
    * vectors are read. Deterministic end to end: seeded codebooks,
    * fixed IEEE lut sums, id tiebreaks. */
  def pqTopK(encoded: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String, probe: Seq[Double], k: Int, shortlist: Int,
      excludeId: Option[Long] = None,
      carryCols: Seq[String] = Seq("label")): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val luts = Array.tabulate(m) { s =>
      codebooks(s).map { cw =>
        var d = 0.0; var i = 0
        while (i < sub) { val t = probe(s * sub + i) - cw(i); d += t * t; i += 1 }
        d
      }
    }
    val adc = (0 until m).map { s =>
      element_at(array(luts(s).map(lit): _*),
        element_at(col("code"), s + 1) + 1)
    }.reduce(_ + _)
    val base = excludeId.fold(encoded)(x => encoded.filter(col(idCol) =!= x))
    val p = array(probe.map(lit): _*)
    base
      .withColumn("adc", adc)
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(shortlist)
      .withColumn("d2", round(
        aggregate(
          zip_with(asDouble(col("embedding")), p, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x), 6))
      .orderBy(col("d2").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol) +: carryCols.map(col) :+ col("d2"): _*)
  }

  /** IVF-PQ: the full Faiss-style two-level index — coarse IVF cells
    * prune WHICH vectors are scanned, PQ codes prune WHAT is read per
    * vector. The probe ranks cells with the assignment metric
    * ([[probeCells]], same as [[ivfTopK]]), the ADC + exact-re-rank
    * stages are [[pqTopK]] verbatim over just the probed cells' rows.
    * At 100 TB the two multiply: nProbe/nCells of the corpus × m bytes
    * per vector — the scan reads ~(8/1024)·(8/256) of the raw data,
    * and the cell filter is a partition-prunable predicate when the
    * encoded table is written clustered by cell (Sinks.rangeClustered).
    * `assigned` must carry both the `cluster` column (ivfAssign) and
    * the `code` column (pqEncode). */
  def ivfPqTopK(assigned: DataFrame, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], idCol: String,
      probe: Seq[Double], k: Int, nProbe: Int, shortlist: Int,
      excludeId: Option[Long] = None,
      carryCols: Seq[String] = Seq("label")): DataFrame = {
    val cells = probeCells(centroids, probe, nProbe)
    pqTopK(assigned.filter(col("cluster").isInCollection(cells)),
      codebooks, idCol, probe, k, shortlist, excludeId, carryCols)
  }

  // ---------------------------------------------------------------------
  // Index persistence (VERDICT r8 item 2): at 100 TB an ANN index is
  // trained ONCE and persisted — the per-call count()+sample+Lloyd's the
  // gates pay is a test-harness shape, not the deployment shape. The
  // artifacts are plain parquet: centroids (nCells rows), codebooks
  // (m·k rows), and the encoded corpus (the cluster/code columns riding
  // the vector table — at scale written clustered by cell so the probe's
  // cell filter partition-prunes). q_ann_persist gates the round-trip:
  // loaded-index answers must equal freshly-trained answers exactly.
  // ---------------------------------------------------------------------

  /** Write IVF centroids to `dir` — one row per cell (cell, centroid). */
  def saveCentroids(spark: SparkSession, dir: String,
      centroids: Array[Array[Double]]): Unit = {
    val s = spark; import s.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1) // nCells rows — one footer beats 32
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
  }

  /** Read IVF centroids back; the collect is bounded by nCells (the
    * quantizer is a few KB by design — see [[ivfAssign]]). */
  def loadCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(s"$dir/centroids.parquet")
      .orderBy("cell").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i, s"centroid cells not contiguous at $i") }
    rows.map(_.getSeq[Double](1).toArray)
  }

  /** Write PQ codebooks to `dir` — one row per (subspace, codeword),
    * plus an (m, k) manifest: the load-time contiguity checks catch gaps
    * and reordering but NOT truncation (0..n-1 stays contiguous when
    * trailing rows are lost), so the expected shape is persisted
    * alongside and partial parquet loss fails the load instead of
    * silently degrading ranking (ADVICE r9). */
  def saveCodebooks(spark: SparkSession, dir: String,
      codebooks: Array[Array[Array[Double]]]): Unit = {
    val s = spark; import s.implicits._
    require(codebooks.nonEmpty && codebooks.forall(_.length ==
      codebooks.head.length), "codebooks must share one codeword count")
    (for ((book, sub) <- codebooks.zipWithIndex;
          (cw, c) <- book.zipWithIndex)
      yield (sub, c, cw.toSeq)).toSeq
      .toDF("subspace", "codeword", "vec")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    Seq((codebooks.length, codebooks.head.length))
      .toDF("m", "k").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks_manifest.parquet")
  }

  /** Read PQ codebooks back; bounded by m·k rows (a few KB). Validates
    * contiguity AND the persisted (m, k) manifest — gaps, reordering,
    * truncation, and unequal subspace sizes all fail the load. */
  def loadCodebooks(spark: SparkSession,
      dir: String): Array[Array[Array[Double]]] = {
    val mf = spark.read.parquet(s"$dir/codebooks_manifest.parquet").collect()
    require(mf.length == 1, s"codebook manifest has ${mf.length} rows")
    val (m, k) = (mf(0).getInt(0), mf(0).getInt(1))
    val rows = spark.read.parquet(s"$dir/codebooks.parquet")
      .orderBy("subspace", "codeword").collect()
    val books = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
    require(books.length == m,
      s"expected $m subspaces, loaded ${books.length}")
    books.zipWithIndex.foreach { case ((sub, cws), i) =>
      // a missing (subspace, codeword) row would silently misalign every
      // encoded code against the book — fail the load instead
      require(sub == i, s"codebook subspaces not contiguous at $i")
      require(cws.length == k,
        s"subspace $i has ${cws.length} codewords, manifest says $k")
      cws.map(_.getInt(1)).sorted.zipWithIndex.foreach { case (c, j) =>
        require(c == j, s"codewords not contiguous at subspace $i, $j") }
    }
    books.map { case (_, cws) =>
      cws.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
    }.toArray
  }

  // ------------------------------------------------------------------
  // Codes-table persistence: versioned generation dirs + ONE atomically
  // swapped pointer file + a layout manifest.
  //
  // Layout under `dir`:
  //   codes_current            — pointer: the live generation's dir NAME
  //   codes_manifest.parquet   — (schema, partitionCols) of the table
  //   codes.parquet            — generation 1 (written by saveCodes)
  //   codes_v<N>.parquet       — generation N (written by compactCodes)
  //
  // Concurrency contract (VERDICT r10 item 3): WRITES are single-writer
  // (the caller serializes saveCodes/appendCodes/compactCodes — there is
  // no transaction log to reconcile concurrent writers); READS are fully
  // concurrent with compaction. A reader resolves the pointer, then
  // scans a generation dir that is never mutated while live — compaction
  // writes the NEXT generation elsewhere and flips the pointer, keeping
  // the just-retired generation on disk for in-flight readers (and free
  // rollback) and deleting only generations ≥2 flips old. So a resolved
  // DataFrame stays valid across one subsequent compaction; resolve
  // again (loadCodes) to track the head. A crash mid-compaction strands
  // only a never-referenced codes_v<N> dir, which the next compaction
  // deletes and rewrites — the pointer always names a complete table.
  // ------------------------------------------------------------------

  private val CodesPointer = "codes_current"

  private def codesFs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val CodesGen = """codes(?:_v(\d+))?\.parquet""".r

  /** Resolve the LIVE generation dir: follow the pointer if present,
    * else the legacy fixed name. Self-heals the legacy two-rename crash
    * state (ADVICE r10): a pre-pointer compaction that died between
    * rename(live→old) and rename(tmp→live) left the complete table
    * stranded at `__compact_old__` with no live path — rename it back. */
  def resolveCodesPath(spark: SparkSession,
      dir: String): org.apache.hadoop.fs.Path = {
    import org.apache.hadoop.fs.Path
    val fs = codesFs(spark, dir)
    val ptr = new Path(s"$dir/$CodesPointer")
    if (fs.exists(ptr)) {
      val in = fs.open(ptr)
      val name = try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), "UTF-8").trim
      } finally in.close()
      require(name.nonEmpty && CodesGen.pattern.matcher(name).matches(),
        s"codes pointer $ptr names no generation: '$name'")
      new Path(s"$dir/$name")
    } else {
      val legacy = new Path(s"$dir/codes.parquet")
      val stranded = new Path(s"$dir/codes.parquet.__compact_old__")
      if (!fs.exists(legacy) && fs.exists(stranded))
        require(fs.rename(stranded, legacy),
          s"cannot recover stranded codes table $stranded")
      legacy
    }
  }

  /** Atomically point `codes_current` at generation `name` — write a
    * sibling tmp and rename over the pointer (FileContext OVERWRITE:
    * atomic on HDFS and POSIX), so a concurrent reader sees the old or
    * the new pointer, never a torn one. */
  private def publishCodesPointer(spark: SparkSession, dir: String,
      name: String): Unit = {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = codesFs(spark, dir)
    val ptr = fs.makeQualified(new Path(s"$dir/$CodesPointer"))
    val tmp = fs.makeQualified(new Path(s"$dir/$CodesPointer.__tmp__"))
    val out = fs.create(tmp, true)
    try out.write(name.getBytes("UTF-8")) finally out.close()
    if (!fs.exists(ptr)) require(fs.rename(tmp, ptr),
      s"cannot publish codes pointer $ptr")
    else FileContext.getFileContext(ptr.toUri, conf)
      .rename(tmp, ptr, Options.Rename.OVERWRITE)
  }

  /** Manifest fingerprint: (name, type) per field, nullability and
    * metadata ignored (literal-derived columns flip nullability freely;
    * the hazard being gated is a renamed/retyped/missing column). */
  private def schemaSig(schema: org.apache.spark.sql.types.StructType) =
    schema.fields.map(f => s"${f.name}:${f.dataType.catalogString}").toSeq

  private def writeCodesManifest(encoded: DataFrame, dir: String,
      partitionCols: Seq[String]): Unit = {
    val s = encoded.sparkSession; import s.implicits._
    Seq((schemaSig(encoded.schema), partitionCols))
      .toDF("schema_sig", "partition_cols").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/codes_manifest.parquet")
  }

  private def readCodesManifest(spark: SparkSession,
      dir: String): Option[(Seq[String], Seq[String])] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$dir/codes_manifest.parquet")
    if (!codesFs(spark, dir).exists(p)) None // pre-manifest table: legacy
    else {
      val rows = spark.read.parquet(p.toString).collect()
      require(rows.length == 1, s"codes manifest has ${rows.length} rows")
      Some((rows(0).getSeq[String](0), rows(0).getSeq[String](1)))
    }
  }

  /** Validate an append/load against the persisted layout manifest —
    * the codebooks lesson (r10) applied to the codes table: a batch
    * appended with different partitionCols, or a drifted schema, would
    * otherwise silently write a mixed-layout table that degrades
    * partition pruning and poisons every later probe. Fails loud. */
  private def requireCodesLayout(spark: SparkSession, dir: String,
      batchSchema: org.apache.spark.sql.types.StructType,
      partitionCols: Seq[String]): Unit =
    readCodesManifest(spark, dir).foreach { case (sig, parts) =>
      require(parts == partitionCols,
        s"codes table at $dir is partitioned by $parts, append says " +
          s"$partitionCols — a mixed layout would break partition pruning")
      val got = schemaSig(batchSchema)
      require(got == sig,
        s"appended batch schema $got drifts from the codes manifest $sig")
    }

  /** Persist the encoded corpus (the vector table carrying `cluster`
    * and/or `code`) — a plain distributed parquet write; nothing passes
    * through the driver. `partitionCols` (typically Seq("cluster"))
    * writes the table CLUSTERED BY CELL: the probe's
    * `cluster IN (probed cells)` filter then prunes whole directories at
    * the scan — at 100 TB the IVF prune becomes partition pruning, and
    * the scan reads nProbe/nCells of the FILES, not just of the rows
    * (SimilarityPersistSpec asserts the partition filter lands).
    * Also persists the layout manifest (schema + partitionCols) that
    * [[appendCodes]]/[[loadCodes]] validate against, resets the pointer
    * to generation 1, and clears stale generations of an overwritten
    * table. */
  def saveCodes(encoded: DataFrame, dir: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val spark = encoded.sparkSession
    val w = clusterForWrite(encoded, partitionCols).write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$dir/codes.parquet")
    writeCodesManifest(encoded, dir, partitionCols)
    publishCodesPointer(spark, dir, "codes.parquet")
    deleteStaleGenerations(spark, dir, keep = Set("codes.parquet"))
  }

  /** Hash-cluster a batch on its partition columns before a partitioned
    * write — [[compactCodes]]' bin-pack layout applied at WRITE time (the
    * Iceberg write.distribution-mode=hash shape; optimization guide §6):
    * without it every encode task writes a sliver into every cell dir,
    * so one batch emits tasks × cells files (measured 512 per save at
    * the gate's 32-way encode fan-out — ~1,500 files across
    * q_ann_compact's three batches) where one-file-per-cell-per-batch is
    * the layout every probe and the compaction itself then pays to read.
    * The extra exchange moves exactly the batch being persisted, once —
    * the write-distribution shuffle every lakehouse writer pays to avoid
    * the small-files death (r11 optimization; row content unchanged,
    * q_ann_* row-identity and top-k gates unaffected).
    *
    * Write parallelism equals the number of occupied hash partitions —
    * bounded by the DISTINCT CELL count (ADVICE r11): with cells < cores
    * some write slots idle, and a hot cell serializes into one task.
    * This is the deliberate trade at the gates' nCells=16 (batches are
    * tiny; task overhead dominates), and a non-issue at deployment scale
    * where nCells ≈ √n ≫ cores by construction (the IVF sizing rule the
    * ivfTrain scaladoc documents). If a deployment ever runs cells ≪
    * cores with fat batches, salt WITHIN the cell
    * (repartition(n, cols :+ pmod(xxhash64(id), k))) — k files per cell
    * per batch instead of 1, parallelism × k. */
  private def clusterForWrite(df: DataFrame,
      partitionCols: Seq[String]): DataFrame =
    if (partitionCols.isEmpty) df
    else df.repartition(partitionCols.map(col): _*)

  /** Read the live codes table back. Resolves the pointer (so it reads
    * the most recent COMPLETE generation) and validates the loaded
    * column set against the manifest — partition columns move to the
    * tail of a partitioned read-back, so the check is name-set + count,
    * not order. */
  def loadCodes(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(resolveCodesPath(spark, dir).toString)
    readCodesManifest(spark, dir).foreach { case (sig, _) =>
      val want = sig.map(_.takeWhile(_ != ':')).toSet
      val got = df.schema.fieldNames.toSet
      require(got == want,
        s"loaded codes columns $got drift from the manifest's $want")
    }
    df
  }

  /** APPEND a newly encoded batch to a persisted codes table — the
    * nightly-ingest half of index maintenance: assign+encode the batch
    * against the LOADED artifacts ([[ivfAssignWith]]/[[pqEncode]]) and
    * append its files; the index grows without retraining or rewriting
    * the corpus. Same cell clustering as [[saveCodes]] so the probe's
    * partition pruning keeps holding over appended files; the manifest
    * check makes a mismatched layout or drifted schema fail loud
    * (VERDICT r10 item 4). Assignment depends only on (embedding,
    * centroids, codebooks), so an incrementally grown index is
    * bit-identical to a one-shot encode of the union — q_ann_append
    * gates exactly that equivalence. */
  def appendCodes(encoded: DataFrame, dir: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val spark = encoded.sparkSession
    requireCodesLayout(spark, dir, encoded.schema, partitionCols)
    val live = resolveCodesPath(spark, dir)
    // one file per cell per batch (see [[clusterForWrite]]) — the append
    // hazard q_ann_compact gates stays real (one file SET per nightly
    // batch), at deployment-shaped file counts
    val w = clusterForWrite(encoded, partitionCols).write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(live.toString)
  }

  /** COMPACT a persisted codes table (VERDICT r9 item 3, made
    * reader-safe in r10→r11): [[appendCodes]] adds one file set per
    * nightly batch, and at 100 TB an uncompacted append-only table is
    * the classic small-files death — every probe pays a footer open per
    * tiny file and the namenode pays the inode count. The rewrite
    * bin-packs: rows are hash-repartitioned on `partitionCols` (so each
    * cell's rows land in ONE task → one file per cell directory, the
    * partition-pruned probe's ideal layout), or coalesced by
    * total-bytes/`targetFileBytes` when unpartitioned.
    *
    * The swap is pointer-based: the compacted table is written to the
    * NEXT generation dir (never visible until complete), then the one
    * pointer file flips atomically. The previous design renamed the live
    * dir away before publishing the new one — a reader probing DURING
    * that window hit path-not-found, and a crash mid-swap stranded the
    * table. Now readers see the old complete generation or the new
    * complete generation at every instant, a crash leaves the pointer on
    * the old generation (rollback is the same one-file flip), and the
    * just-retired generation stays on disk for in-flight readers (older
    * ones are deleted — the Iceberg-style snapshot-expiry contract).
    * Content is row-identical by construction — q_ann_compact gates
    * probe-result identity plus the file-count drop, and
    * SimilarityPersistSpec's concurrent-reader test hammers the swap. */
  def compactCodes(spark: SparkSession, dir: String,
      partitionCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = codesFs(spark, dir)
    val live = resolveCodesPath(spark, dir)
    require(fs.exists(live), s"no codes table to compact at $live")
    // partitionCols only: the read-back schema reorders partition columns
    // to the tail, so the write-side schema sig doesn't apply here
    readCodesManifest(spark, dir).foreach { case (_, parts) =>
      require(parts == partitionCols,
        s"codes table at $dir is partitioned by $parts, compact says " +
          s"$partitionCols — rewriting the layout would break pruning")
    }
    val df = spark.read.parquet(live.toString)
    val nextVer = live.getName match {
      case CodesGen(null) => 2L
      case CodesGen(v) => v.toLong + 1L
    }
    val target = new Path(s"$dir/codes_v$nextVer.parquet")
    fs.delete(target, true) // debris of a crashed prior attempt
    if (partitionCols.nonEmpty) {
      df.repartition(partitionCols.map(col): _*)
        .write.partitionBy(partitionCols: _*)
        .mode("overwrite").parquet(target.toString)
    } else {
      val bytes = fs.getContentSummary(live).getLength
      val nFiles = math.max(1L, (bytes + targetFileBytes - 1)
        / targetFileBytes).toInt
      df.repartition(nFiles).write.mode("overwrite").parquet(target.toString)
    }
    publishCodesPointer(spark, dir, target.getName)
    deleteStaleGenerations(spark, dir,
      keep = Set(live.getName, target.getName))
  }

  /** Delete generation dirs other than `keep` (the live one and, after
    * a compaction, the just-retired one — kept for in-flight readers and
    * rollback). Everything older is ≥2 pointer flips stale. */
  private def deleteStaleGenerations(spark: SparkSession, dir: String,
      keep: Set[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = codesFs(spark, dir)
    val root = new Path(dir)
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (CodesGen.pattern.matcher(n).matches() && !keep(n))
          fs.delete(st.getPath, true)
      }
  }

  /** Count the data files under the LIVE generation of a persisted codes
    * table — the compaction gate's before/after measurement (crc/_SUCCESS
    * excluded). */
  def codesFileCount(spark: SparkSession, dir: String): Long = {
    val live = resolveCodesPath(spark, dir)
    val fs = codesFs(spark, dir)
    val it = fs.listFiles(live, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Sparse cosine similarity join over TOKEN-COUNT vectors via an
    * inverted index — the bag-of-words sibling of the dense-embedding
    * paths above, and the shape a 100 TB sparse similarity join actually
    * takes (Elasticsearch/MoreLikeThis, champion lists): explode
    * (block, token, doc, tf) postings, equi-join postings on
    * (block, token), accumulate the dot product per pair, normalize by
    * per-doc vector norms.
    *
    * Determinism is the design constraint: term frequencies and Σtf² are
    * EXACT INTEGERS (map-side-combinable sums), and the cosine is a fixed
    * three-op IEEE sequence — dot / (sqrt(ssa)·sqrt(ssb)) — on those
    * exact integers, so any engine computing the same formula agrees
    * bit-for-bit (no order-dependent float accumulation anywhere).
    *
    * `dfCap` drops tokens whose in-block document frequency exceeds the
    * cap BEFORE postings join — the standard stop-term pruning that keeps
    * posting-join work (Σ df²) bounded at scale. Norms are computed over
    * the PRUNED vector space, so cosine stays in [0, 1] and the metric is
    * well-defined: it IS "cosine over sub-`dfCap` terms", identically on
    * both engines. Pairs sharing zero surviving tokens never materialize
    * (their cosine is 0). */
  def sparseCosinePairs(docs: DataFrame, id: String, tokCol: String,
      blockCols: Seq[String], dfCap: Int): DataFrame = {
    val bcols = blockCols.map(col)
    val tf = docs
      .select((bcols :+ col(id) :+ explode(col(tokCol)).as("__t")): _*)
      .groupBy((bcols :+ col(id) :+ col("__t")): _*)
      .agg(count(lit(1)).as("__tf"))
    val kept = tf
      .groupBy((bcols :+ col("__t")): _*)
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap)
      .select((bcols :+ col("__t")): _*)
    // Materialize-once barrier (the shingledDocs convention): the pruned
    // posting list feeds BOTH sides of the self-join AND the norms —
    // without it the tokenize→tf→df-cap pipeline recomputes four times
    // (measured 6.3 s vs 2.3 s at sf0.1). At 100 TB the same shape
    // persists to disk once and every consumer reads the postings table.
    val pruned = tf.join(kept, blockCols :+ "__t").cache()
    val norms = pruned
      .groupBy((bcols :+ col(id)): _*)
      .agg(sum(col("__tf") * col("__tf")).as("__ss"))
    def sided(df: DataFrame, side: String) =
      df.toDF(df.columns.map {
        case `id` => s"id_$side"
        case "__tf" => s"tf_$side"
        case "__ss" => s"ss_$side"
        case c => c
      }: _*)
    sided(pruned, "a").join(sided(pruned, "b"), blockCols :+ "__t")
      .filter(col("id_a") < col("id_b"))
      .groupBy((bcols :+ col("id_a") :+ col("id_b")): _*)
      .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
      .join(sided(norms, "a"), blockCols :+ "id_a")
      .join(sided(norms, "b"), blockCols :+ "id_b")
      .withColumn("cos",
        col("dot").cast("double") /
          (sqrt(col("ss_a").cast("double")) * sqrt(col("ss_b").cast("double"))))
  }

  /** One Lloyd ASSIGNMENT step with deterministic seeds: centroids are the
    * `k` lowest-id vectors (the reproducible init any engine can recompute
    * — no RNG, no layout dependence), every vector goes to its nearest
    * centroid by squared euclidean distance, ties to the lowest centroid
    * id. This is the distributed half of k-means — the half that touches
    * all the data; [[localKMeans]] is the driver-local other half.
    *
    * Scale shape: the centroid table is k rows → broadcast nested-loop
    * join; the scan side streams once with no shuffle; the per-row argmin
    * is a `min(struct(d2, cid))` partial aggregate (map-side combine on
    * the id key). d2 is rounded to 6 decimals so the reported distance is
    * engine-portable (double accumulation of 64 products agrees far past
    * 1e-6; the round absorbs last-ulp order differences).
    */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    // Deterministic init: k lowest ids. A k-row TakeOrdered, not a sort.
    val cents = emb.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).as("__cid"),
        requireVec(asDouble(col(vecCol))).as("__cvec"))
    emb
      .select(col(idCol), requireVec(asDouble(col(vecCol))).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("__d2", round(
        aggregate(
          zip_with(col("__v"), col("__cvec"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x), 6))
      .groupBy(col(idCol))
      .agg(min(struct(col("__d2"), col("__cid"))).as("__m"))
      .select(col(idCol), col("__m.__cid").as("cid"), col("__m.__d2").as("d2"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster the embedding
    * space, then prune near-duplicate PAIRS only within each cluster —
    * a row is dropped when any SAME-CLUSTER peer with a smaller id has
    * cosine ≥ `threshold` (keep-lowest-id, the deterministic stand-in for
    * the paper's keep-farthest-from-centroid; both keep exactly one per
    * tight neighborhood).
    *
    * Scale shape: clustering bounds the candidate space exactly like
    * lang-blocking bounds [[graft.ops.Dedup.jaccardPairs]] — pair work is
    * Σ_c |c|², never N², and each cluster's pairs co-locate under one
    * hash-partition key (`cid`), so the quadratic stage shards evenly
    * when k is sized to the corpus (k ≈ N / target_cluster_size; the
    * paper runs k = 11k on 5B embeddings). The scoring kernel is the
    * codegen'd [[graft.functions.CosineSim]] single-pass fused
    * dot+norms; the assignment pass is [[kmeansAssign]]'s broadcast
    * nested-loop (no shuffle on the corpus side).
    *
    * Returns one row per vector: (idCol, cid, n_dups, keep) where
    * n_dups = smaller-id in-cluster neighbors at ≥ threshold and
    * keep = 1 iff n_dups = 0. Cosines are rounded to 6 decimals BEFORE
    * the threshold compare so the verdict is engine-portable. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double): DataFrame = {
    require(threshold <= 1.0,
      s"threshold=$threshold > 1 makes every pair a non-duplicate; " +
        "the duplicate-collapse in-group shortcut assumes cos(v,v) ≥ t")
    // EXACT-DUPLICATE COLLAPSE first (what the SemDeDup paper's pipeline
    // does before clustering): m identical vectors are cosine-1 pairs
    // with everything in their group, so an uncollapsed pair stage pays
    // m²/2 join rows for a clone cluster — the embedding twin of the
    // minhash clone hazard, and the skew canary's dup-vectors gate. One
    // hash shuffle on the vector itself groups duplicates; every later
    // stage runs over DISTINCT vectors (Σ_cell |distinct|², not
    // Σ_cell |rows|²), and members expand back per group with their
    // sorted id list riding as one row-sized array. Results are
    // BIT-IDENTICAL to the pairwise form (the q_semdedup oracle replays
    // pairwise SQL and still hash-matches): identical vectors share
    // their representative's cell (same argmin over the same doubles)
    // and their cross-group cosines (same IEEE inputs), in-group
    // smaller-id neighbors are exactly the member's rank in the sorted
    // id list, and cross-group smaller-id neighbors count via an array
    // filter over the neighbor group's id list.
    val v = emb.select(col(idCol), requireVec(asDouble(col(vecCol))).as("__v"))
    val groups = v.groupBy("__v")
      .agg(min(col(idCol)).as("__gid"),
        sort_array(collect_list(col(idCol))).as("__ids"))
    // centroids from the FULL corpus (k lowest ids — the deterministic
    // init any engine can recompute), assignment over representatives
    val cents = v.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).as("__cid"), col("__v").as("__cvec"))
    val repAssigned = groups
      .crossJoin(broadcast(cents))
      .withColumn("__d2", round(
        aggregate(
          zip_with(col("__v"), col("__cvec"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x), 6))
      .groupBy(col("__gid"))
      .agg(min(struct(col("__d2"), col("__cid"))).as("__m"),
        first(col("__v")).as("__v"), first(col("__ids")).as("__ids"))
      .select(col("__gid"), col("__m.__cid").as("cid"),
        col("__v"), col("__ids"))
    // qualified neighbor GROUPS per group (both directions), carrying
    // the neighbor's sorted id list
    def rside(n: String) = repAssigned.select(col("cid"),
      col("__gid").as(s"gid_$n"), col("__v").as(s"v_$n"),
      col("__ids").as(s"ids_$n"))
    val nbr = rside("a").join(rside("b"), Seq("cid"))
      .filter(col("gid_a") =!= col("gid_b"))
      .withColumn("__cos", round(
        graft.functions.CosineSim.cosine_sim(col("v_a"), col("v_b")), 6))
      .filter(col("__cos") >= threshold)
      .select(col("gid_a").as("__gid"), col("ids_b"))
    // member expansion: in-group term = rank in the sorted id list,
    // cross-group term = smaller ids in each qualified neighbor group.
    // The in-group term fires only for a group whose vector has NONZERO
    // norm: identical nonzero vectors round to cos 1.0 ≥ threshold, but
    // cos(0⃗, 0⃗) is NULL in CosineSim (undefined), so the pairwise form
    // this collapse must stay bit-identical to drops zero-norm pairs —
    // counting their rank here would diverge on exactly that input.
    // (NaN/Inf components give NaN sums, and NaN > 0 is TRUE under
    // Spark's total-order NaN semantics — matching the pairwise form,
    // where round(NaN, 6) ≥ t is also true.)
    val members = repAssigned.select(col("cid"), col("__gid"),
      (aggregate(col("__v"), lit(0.0), (acc, x) => acc + x * x) > 0)
        .as("__selfok"),
      posexplode(col("__ids")).as(Seq("__rank", "__id")))
    members.join(nbr, Seq("__gid"), "left")
      .withColumn("__c",
        when(col("ids_b").isNull, lit(0))
          .otherwise(size(filter(col("ids_b"), x => x < col("__id")))))
      .withColumn("__r",
        when(col("__selfok"), col("__rank")).otherwise(lit(0)))
      .groupBy(col("__id").as(idCol), col("cid"), col("__r"))
      .agg(sum(col("__c")).as("__cross"))
      .select(col(idCol), col("cid"),
        (col("__r").cast("long") + col("__cross")).as("n_dups"),
        ((col("__r") + col("__cross")) === 0).cast("int").as("keep"))
  }

  /** All pairs of 64-bit hashes within Hamming distance `maxHam`, via
    * band-equality blocking — the bit-domain LSH the SimHash/MinHash
    * dedups use, packaged for perceptual image hashes
    * ([[graft.multimodal.Multimodal.averageHash]]) or any other bitmap
    * signature. Each hash splits into `bands` disjoint `bandBits`-bit
    * bands; a pair is a candidate iff SOME band matches exactly, then
    * the true Hamming distance (one codegen'd `bit_count(a ^ b)`)
    * verifies. Pigeonhole completeness: distance ≤ d flips at most d
    * bands, so with bands > d every true pair shares an untouched band —
    * 4×15-bit bands are EXACT for maxHam ≤ 3 and high-recall heuristic
    * beyond (the standard recall/cost dial; more bands = more recall,
    * more candidates).
    *
    * Scale shape (100 TB): one shuffle on (band_idx, band_val);
    * candidate work is Σ_buckets |bucket|², bounded by `maxBucket` — the
    * posting-join df-cap discipline: a band value shared by more than
    * `maxBucket` hashes (a flat-color thumbnail, an all-zero watermark)
    * is dropped from CANDIDATE GENERATION in that band only, exactly the
    * hub-cap trade q_dedup_near documents. Bands use UNSIGNED shifts so
    * a bit-63 hash (valid: hashes are signed-long bitmaps) bands
    * correctly. Output: (key_a, key_b, hash_a, hash_b, hamming),
    * key_a < key_b, each qualifying pair once. */
  /** Band projection shared by [[hammingPairs]] and the streaming twin
    * ([[graft.streaming.Streams.hammingMatches]]) — ONE definition of
    * "the bands", so the two halves cannot drift. Output:
    * (k, h, band_idx, band_val). */
  def hashBands(hashes: DataFrame, keyCol: String, hashCol: String,
      bands: Int, bandBits: Int): DataFrame = {
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    hashes.select(col(keyCol).cast("long").as("k"),
        col(hashCol).cast("long").as("h"))
      .select(col("k"), col("h"),
        posexplode(array((0 until bands).map { b =>
          expr(s"shiftrightunsigned(h, ${b * bandBits}) & $mask")
        }: _*)).as(Seq("band_idx", "band_val")))
  }

  def hammingPairs(hashes: DataFrame, keyCol: String, hashCol: String,
      bands: Int, bandBits: Int, maxHam: Int,
      maxBucket: Int = 1024): DataFrame = {
    require(bands >= 2 && bandBits >= 1 && bands * bandBits <= 64,
      s"need 2+ bands and bands*bandBits <= 64, got $bands x $bandBits")
    require(maxHam >= 0 && maxBucket >= 2,
      s"need maxHam >= 0 and maxBucket >= 2, got $maxHam / $maxBucket")
    // Materialized ONCE — the [[graft.ops.Dedup.minhashNearDups]] banded-
    // postings discipline: the bucket-cap stats and BOTH sides of the
    // candidate self-join consume this frame, and the column renames make
    // the subtrees plan-distinct, so an unmaterialized banding re-ran the
    // caller's full upstream chain per consumer (q_image_hash's PPM
    // encode + decode ran 16×: 16 parquet scans in the r11 before-plan,
    // 2 after). Bounded: exactly `bands` rows per input hash.
    val banded = Checkpoints.materialize(
      hashBands(hashes, keyCol, hashCol, bands, bandBits))
    val keepBuckets = banded.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket)
      .select("band_idx", "band_val")
    val b2 = banded.join(keepBuckets, Seq("band_idx", "band_val"))
    val cand = b2
      .select(col("band_idx"), col("band_val"),
        col("k").as("key_a"), col("h").as("hash_a"))
      .join(b2.select(col("band_idx"), col("band_val"),
        col("k").as("key_b"), col("h").as("hash_b")),
        Seq("band_idx", "band_val"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b", "hash_a", "hash_b")
      .distinct()
    cand
      .withColumn("hamming", expr("CAST(bit_count(hash_a ^ hash_b) AS INT)"))
      .filter(col("hamming") <= maxHam)
  }
}
