package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Executable 10× scale canary (VERDICT r7 item 2): synthesize a ~10×
  * blowup of the driver's sf0.1 tables and time the bench's slow-tail
  * families on both corpora, so the "would this survive 100 TB" design
  * notes become MEASURED growth ratios instead of arguments.
  *
  * Blowup semantics — model ORGANIC corpus growth, not duplication:
  *  - documents ×f: copy k prefixes every whitespace token with "c<k>x",
  *    so copies are DISJOINT in token/shingle space (duplicating text
  *    verbatim would make every doc a 10-clone near-dup cluster and
  *    inflate pair counts ~f²/2-fold — growth no organic corpus shows;
  *    disjoint copies keep per-token df constant, so posting-join work
  *    Σdf² scales linearly with the corpus, which is the claim under
  *    test). doc_id remaps to doc_id·f+k (collision-free).
  *  - embeddings ×f: copy k rotates the 64-dim vector left by k — same
  *    norm and coordinate distribution, no exact-duplicate vectors
  *    (identical copies would degenerate ANN/semdedup into cos=1 ties).
  *  - customer ×f: fresh custkeys (the q_dbscan plane derives points
  *    from custkey hashes, so new keys = new points; its ε² ∝ 1/n
  *    keeps the core/border mix SF-invariant by design).
  *  - lineitem ×f: fresh orderkeys with the same baskets — the
  *    co-occurrence graph gets f× the pair observations over the same
  *    part catalog (a denser graph, the realistic direction for a
  *    catalog-stable business growing 10×).
  *  - other tables symlink to the base files.
  *
  * Usage: runMain graft.tools.ScaleCanary <baseSfDir> [factor] [outDir]
  * Prints one table row per query: base seconds, canary seconds, ratio
  * (min of SPARK_GRAFT_CANARY_PASSES runs, default 2, after an untimed
  * warm pass of the input tables — the Bench warm-input methodology).
  */
object ScaleCanary {

  private val CanaryQueries = Seq(
    "q_prefix_join", "q_snm_dedup", "q_weighted_jaccard", "q_dedup_eval",
    "q_dedup_near", "q_dedup_minhash", "q_pagerank", "q_kcore",
    "q_graph_diameter", "q_dbscan",
    // ANN family: scan (linear), IVF×PQ (cell-pruned), cluster-prune,
    // broadcast probe batch — all designed ≲linear; measured here
    "q_similarity_topk", "q_ivf_pq", "q_semdedup", "q_batch_ann")

  def main(args: Array[String]): Unit = {
    val baseDir = args(0)
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val outDir = args.lift(2).getOrElse(s"/tmp/graft_canary_${factor}x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, baseDir, outDir, factor)
    val passes = sys.env.getOrElse("SPARK_GRAFT_CANARY_PASSES", "2").toInt
    def timeAll(dir: String): Map[String, Double] = {
      for (t <- Seq("lineitem", "customer", "documents", "embeddings"))
        graft.Tables.table(spark, dir, t).cache().count() // warm inputs
      val r = (1 to passes).flatMap { _ =>
        CanaryQueries.map { name =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir).count()
          name -> (System.nanoTime() - t0) / 1e9
        }
      }.groupBy(_._1).map { case (n, ts) => n -> ts.map(_._2).min }
      for (t <- Seq("lineitem", "customer", "documents", "embeddings"))
        graft.Tables.table(spark, dir, t).unpersist()
      r
    }
    val base = timeAll(baseDir)
    val canary = timeAll(outDir)
    println(f"[canary] ${"query"}%-20s ${"base_s"}%8s ${"x" + factor + "_s"}%8s ${"ratio"}%7s")
    CanaryQueries.foreach { q =>
      val b = base(q); val c = canary(q)
      println(f"[canary] $q%-20s $b%8.2f $c%8.2f ${c / b}%7.2f")
    }
    val tb = base.values.sum; val tc = canary.values.sum
    println(f"[canary] ${"TOTAL"}%-20s $tb%8.2f $tc%8.2f ${tc / tb}%7.2f (factor $factor)")
    spark.stop()
  }

  private def build(spark: SparkSession, base: String, out: String,
      f: Int): Unit = {
    if (Files.exists(Paths.get(out, "_CANARY_OK"))) return
    Files.createDirectories(Paths.get(out))
    def blowup(df: DataFrame)(copy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until f).map(k => copy(df, k)).reduce(_.unionByName(_))

    val docs = graft.Tables.documents(spark, base)
    blowup(docs) { (d, k) =>
      val text =
        if (k == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => concat(lit(s"c${k}x"), w)), " ")
      d.select((col("doc_id") * f + k).as("doc_id"), text.as("text"),
        col("lang"), col("source"), length(text).cast("long").as("n_chars"))
    }.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = graft.Tables.embeddings(spark, base)
    blowup(emb) { (e, k) =>
      val v =
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, 64 - k),
          slice(col("embedding"), 1, k))
      e.select((col("vec_id") * f + k).as("vec_id"), v.as("embedding"),
        col("label"))
    }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    blowup(graft.Tables.customer(spark, base)) { (c, k) =>
      c.withColumn("c_custkey", col("c_custkey") * f + k)
    }.write.mode("overwrite").parquet(s"$out/customer.parquet")

    blowup(graft.Tables.lineitem(spark, base)) { (l, k) =>
      l.withColumn("l_orderkey", col("l_orderkey") * f + k)
    }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    for (t <- Seq("region", "nation", "supplier", "part", "orders", "events")) {
      val link = Paths.get(out, s"$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link, Paths.get(base, s"$t.parquet"))
    }
    Files.write(Paths.get(out, "_CANARY_OK"), Array.emptyByteArray)
  }
}
