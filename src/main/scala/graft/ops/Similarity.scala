package graft.ops

import org.apache.spark.ml.clustering.KMeans
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

  /** Fetch one probe vector (as doubles) by id — a driver-side scalar fetch
    * of a query *parameter*, not a data collect. */
  def probeVector(emb: DataFrame, idCol: String, id: Long): Seq[Double] =
    emb.filter(col(idCol) === id)
      .select(asDouble(col("embedding")).as("p"))
      .head().getSeq[Double](0)

  /** Brute-force cosine top-k against a literal probe vector. */
  def bruteForceTopK(emb: DataFrame, idCol: String, probe: Seq[Double],
      k: Int, excludeId: Option[Long] = None): DataFrame = {
    val p = array(probe.map(lit): _*)
    val base = excludeId.fold(emb)(x => emb.filter(col(idCol) =!= x))
    base
      .withColumn("cos", round(cosine_sim(asDouble(col("embedding")), p), 6))
      .select(col(idCol), col("label"), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF index: seeded k-means coarse quantizer + full-corpus assignment.
    *
    * The quantizer trains on a BOUNDED sample (256·nCells vectors, few
    * partitions, seeded random init) — standard IVF practice: at 100 TB
    * you never k-means the corpus, you train the quantizer on a sample
    * and make one assignment pass over everything. At bench scale this
    * also kills the dominant cost, which was scheduling ~18 tiny-task
    * jobs (k-means|| init passes + iterations) across 32 partitions of
    * 2 000 rows. Assignment stays a single full-width map pass. */
  def ivfAssign(spark: SparkSession, emb: DataFrame, nCells: Int): (DataFrame, Array[Array[Double]]) = {
    val withVec = graft.Tables.fanOut(spark, emb)
      .withColumn("__vec", array_to_vector(asDouble(col("embedding"))))
    // Seeded UNIFORM sample, not limit(): limit takes the corpus HEAD
    // (biased when ingest order clusters, the norm at 100 TB) and
    // collapses to one partition, which coalesce cannot widen again.
    // The count is a cheap parquet-metadata aggregate; repartition(4)
    // right-sizes the k-means jobs for a few-thousand-row sample.
    val maxTrain = 256L * nCells
    val n = emb.count()
    val base = withVec.select("__vec")
    val trainSample =
      (if (n > maxTrain) base.sample(maxTrain.toDouble / n, 42L) else base)
        .repartition(4)
        .cache()
    val km = new KMeans()
      .setK(nCells).setSeed(42L).setMaxIter(5)
      .setInitMode("random") // seeded, 1 init pass vs k-means||'s ~5
      .setFeaturesCol("__vec").setPredictionCol("cluster")
    val model =
      try km.fit(trainSample)
      finally trainSample.unpersist()
    val assigned = model.transform(withVec).drop("__vec")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** The LSH-bucketed ANN variant: BucketedRandomProjectionLSH (euclidean
    * family — for unit-norm embeddings euclidean and cosine order agree up
    * to monotone transform). `approxNearestNeighbors` prunes to colliding
    * hash buckets; at 100 TB the hash columns are precomputed write-side
    * and candidate generation is a bucket equi-join (same shape as
    * Dedup.lshBands). Seeded; returns (idCol, label, dist) top-k by
    * euclidean distance. */
  def lshTopK(spark: SparkSession, emb: DataFrame, idCol: String,
      probe: Seq[Double], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val withVec = graft.Tables.fanOut(spark, emb)
      .withColumn("__vec", array_to_vector(asDouble(col("embedding"))))
    val base = excludeId.fold(withVec)(x => withVec.filter(col(idCol) =!= x))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0)
      .setNumHashTables(4)
      .setSeed(42L)
      .setInputCol("__vec")
      .setOutputCol("__hashes")
    val model = lsh.fit(base)
    model.approxNearestNeighbors(base, Vectors.dense(probe.toArray), k, "dist")
      .select(col(idCol), col("label"), round(col("dist"), 6).as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
  }

  /** IVF query: score only the nProbe cells whose centroids are nearest the
    * probe (cosine), then brute-force inside them. */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
      idCol: String, probe: Seq[Double], k: Int, nProbe: Int,
      excludeId: Option[Long] = None): DataFrame = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cells = centroids.zipWithIndex
      .map { case (c, i) => (i, cos(c.toSeq, probe)) }
      .sortBy { case (i, s) => (-s, i) }
      .take(nProbe).map(_._1)
    val p = array(probe.map(lit): _*)
    val base = excludeId.fold(assigned)(x => assigned.filter(col(idCol) =!= x))
    base
      .filter(col("cluster").isInCollection(cells.toSeq))
      .withColumn("cos", round(cosine_sim(asDouble(col("embedding")), p), 6))
      .select(col(idCol), col("label"), col("cluster"), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
