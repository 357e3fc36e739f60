package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the training-pipeline queries (PipelineQueries) beyond
  * the driver's DuckDB value gate. */
class PipelineSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, Sf001).cache()

  test("hash split partitions the corpus at ~80/10/10 and is rerun-stable") {
    val rows = PipelineQueries.hashSplit.run(spark, Sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.count()
    assert(rows.values.sum === total)
    assert(rows.keySet === Set("train", "valid", "test"))
    val frac = rows("train").toDouble / total
    // 256 buckets, 204 train: binomial 4σ on the smallest SF corpus
    assert(frac > 0.70 && frac < 0.90, s"train frac $frac")
    val again = PipelineQueries.hashSplit.run(spark, Sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === rows) // pure function of the key — no RNG state
  }

  test("chunking covers every doc with stride-448 windows of ≤512 chars") {
    val chunks = PipelineQueries.chunkDocs.run(spark, Sf001).cache()
    // every doc appears; chunk_idx is dense from 0; windows never overrun
    assert(chunks.select("doc_id").distinct().count() === docs.count())
    assert(chunks.filter(col("chunk_chars") > 512).count() === 0)
    val badIdx = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_idx").as("mx"), min("chunk_idx").as("mn"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(badIdx.count() === 0)
    // stride < window ⇒ total chunk chars ≥ total text chars (overlap)
    val sumChunk = chunks.agg(sum("chunk_chars")).head().getLong(0)
    val sumText = docs.agg(sum(length(col("text")))).head().getLong(0)
    assert(sumChunk >= sumText)
    chunks.unpersist()
  }

  test("sequence packing conserves tokens and numbers bins densely per lang") {
    val bins = PipelineQueries.packSequences.run(spark, Sf001).cache()
    val totalTok = docs
      .agg(sum(size(graft.ops.Text.tokens(col("text"))).cast("long")))
      .head().getLong(0)
    assert(bins.agg(sum("bin_tokens")).head().getLong(0) === totalTok)
    val badBins = bins.groupBy("lang")
      .agg(min("bin").as("mn"), max("bin").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(badBins.count() === 0, "bins must be dense 0..max per lang")
    bins.unpersist()
  }

  test("domain cap keeps at most 50 docs per source, lowest ids first") {
    val kept = PipelineQueries.domainCap.run(spark, Sf001).cache()
    val over = kept.groupBy("source").count().filter(col("count") > 50)
    assert(over.count() === 0)
    // a capped source keeps exactly its 50 lowest doc_ids
    val perSource = docs.groupBy("source").count()
      .filter(col("count") > 50).select("source").collect().map(_.getString(0))
    perSource.take(2).foreach { src =>
      val expect = docs.filter(col("source") === src)
        .orderBy("doc_id").limit(50)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val got = kept.filter(col("source") === src)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === expect, s"source $src cap selection")
    }
    kept.unpersist()
  }

  test("epoch shuffle is a deterministic total order independent of partitioning") {
    val page = PipelineQueries.globalShuffle.run(spark, Sf001)
      .collect().map(_.getLong(0)).toSeq
    assert(page.size === math.min(2000L, docs.count()).toInt)
    assert(page.distinct.size === page.size)
    val again = PipelineQueries.globalShuffle.run(spark, Sf001)
      .collect().map(_.getLong(0)).toSeq
    assert(again === page)
  }

  test("importance weights rank the target slice above the rest on average") {
    // the DSIR sanity check: docs whose source DEFINED the target
    // distribution must average a higher weight than the rest (their own
    // hashed-n-gram mass is what the target counts were built from)
    val w = PipelineQueries.importanceWeight.run(spark, Sf001)
      .join(docs.select("doc_id", "source"), "doc_id")
      .withColumn("tgt", col("source").isin("src0", "src1", "src2"))
      .groupBy("tgt").agg(avg("weight").as("aw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false), s"target ${w(true)} vs rest ${w(false)}")
  }

  test("importance keep flag is exactly weight > 1 and empty docs weigh 0") {
    val iw = PipelineQueries.importanceWeight.run(spark, Sf001).cache()
    val bad = iw.filter(
      (col("keep") === 1) =!= (col("weight") > 1.0)).count()
    assert(bad === 0)
    val inconsistent = iw.filter(
      col("n_tok") === 0 && (col("weight") =!= 0.0 || col("keep") =!= 0)).count()
    assert(inconsistent === 0)
    iw.unpersist()
  }

  test("weighted sample is partition-invariant and weight-sensitive") {
    import spark.implicits._
    // pure function of (key, weight): layout cannot change membership
    val docs = (1L to 400L).map(i => (i, 10L + (i % 37))).toDF("doc_id", "n_chars")
    def sample(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        graft.ops.Router.aresKey(col("doc_id"), col("n_chars")).as("k"))
      .orderBy(col("k").desc, col("doc_id")).limit(50)
      .select("doc_id").as[Long].collect().toSet
    assert(sample(docs.repartition(1)) === sample(docs.repartition(32)))
    // an overwhelming weight forces inclusion: ln(u)/w → 0⁻ as w → ∞,
    // beating every finite-weight key with u < 1
    val heavy = docs.withColumn("n_chars",
      when(col("doc_id") === 123L, lit(1000000000L)).otherwise(col("n_chars")))
    assert(sample(heavy).contains(123L))
    // equal weights reduce to a plain top-k by hash — exactly 50 rows
    assert(sample(docs.withColumn("n_chars", lit(1L))).size === 50)
  }

  test("temporal split partitions every order and certifies no leakage") {
    val rows = PipelineQueries.timeSplit.run(spark, Sf001).collect()
    assert(rows.map(_.getAs[String]("split")).toSet ===
      Set("train", "valid", "test"))
    assert(rows.map(_.getAs[Long]("n_rows")).sum ===
      graft.Tables.orders(spark, "/root/testdata/sf0.001").count())
    assert(rows.forall(_.getAs[Int]("no_leakage") === 1))
    val byS = rows.map(r => r.getAs[String]("split") ->
      ((r.getAs[Int]("min_day"), r.getAs[Int]("max_day")))).toMap
    assert(byS("train")._2 < byS("valid")._1)
    assert(byS("valid")._2 < byS("test")._1)
  }

  test("bursts: every episode's days really beat 2x their trailing baseline") {
    import spark.implicits._
    val rows = SeriesQueries.bursts.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("len") ===
        r.getAs[Long]("end_day") - r.getAs[Long]("start_day") + 1,
        "episodes are consecutive-day runs")
      assert(r.getAs[Long]("peak_cents") <= r.getAs[Long]("total_cents"))
    }
    // recount the first episode's first day against the raw series
    val daily = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy(datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date")).cast("long").as("t"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("v"))
      .as[(Long, Long)].collect().toMap
    val d0 = rows.head.getAs[Long]("start_day")
    val trail = (d0 - 28 to d0 - 1).flatMap(daily.get)
    assert(trail.size >= 14)
    assert(trail.size * daily(d0) > 2 * trail.sum)
  }
}
