package graft

import graft.ops.Similarity

/** Driver-contract invariants + the ANN recall bound. */
class EntrySpec extends SparkSpec {

  test("entry: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are unique") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(SparkEntry.specs.map(_.name).distinct.size === SparkEntry.specs.size)
  }

  test("similarity top-k ops accept a frame with ONLY (id, embedding)") {
    // regression for the hard-coded `label` projection: the ops must be
    // generic over the caller's payload columns (carryCols), so a bare
    // (vec_id, embedding) frame works with carryCols = Nil
    val bare = Tables.embeddings(spark, Sf001).select("vec_id", "embedding")
    val probe = Similarity.probeVector(bare, "vec_id", 0L)
    val bf = Similarity.bruteForceTopK(bare, "vec_id", probe, 5, Some(0L),
      carryCols = Nil)
    assert(bf.columns.toSeq === Seq("vec_id", "cos") && bf.count() === 5)
    val (assigned, centroids) = Similarity.ivfAssign(spark, bare, 16)
    val ivf = Similarity.ivfTopK(assigned, centroids, "vec_id", probe, 5, 8,
      Some(0L), carryCols = Nil)
    assert(ivf.columns.toSeq === Seq("vec_id", "cluster", "cos") &&
      ivf.count() === 5)
    val books = Similarity.pqTrain(spark, bare, m = 8, k = 16)
    val pq = Similarity.pqTopK(Similarity.pqEncode(spark, bare, books), books,
      "vec_id", probe, 5, 64, Some(0L), carryCols = Nil)
    assert(pq.columns.toSeq === Seq("vec_id", "d2") && pq.count() === 5)
    val lsh = Similarity.lshTopK(spark, bare, "vec_id", probe, 5, Some(0L),
      carryCols = Nil)
    assert(lsh.columns.toSeq === Seq("vec_id", "dist"))
  }

  test("ANN (IVF) recall >= 0.85 vs exact brute-force top-20 (measured 0.95)") {
    val emb = Tables.embeddings(spark, Sf001)
    val probe = Similarity.probeVector(emb, "vec_id", 0L)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", probe, 20, Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val (assigned, centroids) = Similarity.ivfAssign(spark, emb, 16)
    val approx = Similarity.ivfTopK(assigned, centroids, "vec_id", probe, 20, 8, Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.85, s"IVF recall $recall too low")
  }

  test("LSH ANN recall >= 0.85 vs exact euclidean top-20 (measured 0.95)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, Sf001)
    val probe = Similarity.probeVector(emb, "vec_id", 0L)
    val p = array(probe.map(lit): _*)
    val exact = emb.filter(col("vec_id") =!= 0L)
      .withColumn("d2",
        aggregate(zip_with(transform(col("embedding"), x => x.cast("double")), p,
          (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(spark, emb, "vec_id", probe, 20, Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.85, s"LSH recall $recall too low")
  }

  test("PQ: codes are well-formed and ADC+re-rank recall >= 0.9 vs exact top-20 (measured 1.0)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, Sf001)
    val probe = Similarity.probeVector(emb, "vec_id", 0L)
    val books = Similarity.pqTrain(spark, emb, m = 8, k = 16)
    assert(books.length === 8 && books.forall(_.forall(_.length === 8)))
    val encoded = Similarity.pqEncode(spark, emb, books)
    // every vector gets an m-entry code with entries in [0, k)
    assert(encoded.filter(size(col("code")) =!= 8).count() === 0)
    assert(encoded.filter(exists(col("code"),
      c => c < 0 || c >= 16)).count() === 0)
    // encode agrees with the driver-local kernel on a spot-checked row
    val row = encoded.filter(col("vec_id") === 1L)
      .select(transform(col("embedding"), x => x.cast("double")), col("code"))
      .head()
    val v = row.getSeq[Double](0).toArray
    val want = (0 until 8).map(s => graft.functions.NearestCentroid.compute(
      java.util.Arrays.copyOfRange(v, s * 8, (s + 1) * 8), books(s)))
    assert(row.getSeq[Int](1) === want)
    val p = array(probe.map(lit): _*)
    val exact = emb.filter(col("vec_id") =!= 0L)
      .withColumn("d2",
        aggregate(zip_with(transform(col("embedding"), x => x.cast("double")), p,
          (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = Similarity.pqTopK(encoded, books, "vec_id", probe, 20, 512, Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"PQ recall $recall too low")
  }

  test("IVF-PQ: two-level prune recall >= 0.85 vs exact euclidean top-20 (measured 0.95)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, Sf001)
    val probe = Similarity.probeVector(emb, "vec_id", 0L)
    val (assigned, centroids) = Similarity.ivfAssign(spark, emb, 16)
    val books = Similarity.pqTrain(spark, emb, m = 8, k = 16)
    val encoded = Similarity.pqEncode(spark, assigned, books)
    val p = array(probe.map(lit): _*)
    val exact = emb.filter(col("vec_id") =!= 0L)
      .withColumn("d2",
        aggregate(zip_with(transform(col("embedding"), x => x.cast("double")), p,
          (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfPqTopK(encoded, centroids, books, "vec_id",
        probe, 20, 8, 256, Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.85, s"IVF-PQ recall $recall too low")
  }

  test("multimodal decode: features align with payload bytes") {
    val packed = multimodal.Multimodal.packDocuments(Tables.documents(spark, Sf001))
    val feats = multimodal.Multimodal.decodeFeatures(spark, packed)
    val joined = feats.join(Tables.documents(spark, Sf001), "doc_id")
    import org.apache.spark.sql.functions._
    assert(joined.filter(col("n_bytes") =!= length(col("text"))).count() === 0)
    assert(feats.filter(col("fake_width") < 1 || col("fake_width") > 64).count() === 0)
  }
}
