package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("checkBlock: one scan yields one row per rule with exact counts") {
    val df = Seq((1, 0.0), (2, 5.0), (3, 0.0), (4, -1.0))
      .toDF("id", "v")
    val r = Quality.checkBlock(df, Seq(
        "zero_v" -> (col("v") === 0.0),
        "neg_v" -> (col("v") < 0.0)))
      .orderBy("check")
      .as[(String, Long, Long)].collect().toSeq
    assert(r === Seq(("neg_v", 1L, 4L), ("zero_v", 2L, 4L)))
  }

  test("orphanCheck counts children without a parent") {
    val child = Seq((1, 10), (2, 10), (3, 99)).toDF("id", "pid")
    val parent = Seq((10, "x")).toDF("pk", "name")
    val r = Quality.orphanCheck("orphans", child, "pid", parent, "pk")
      .as[(String, Long, Long)].head()
    assert(r === (("orphans", 1L, 3L)))
  }

  test("joinSizeByHistogram equals the actual join cardinality") {
    val a = Seq(1, 1, 1, 2, 3).toDF("k")
    val b = Seq(1, 2, 2, 4).toDF("k2")
    val predicted = Quality.joinSizeByHistogram(a, "k", b, "k2")
      .as[Long].head()
    val actual = a.join(b, col("k") === col("k2")).count()
    assert(predicted === 5L) // 3*1 + 1*2
    assert(predicted === actual)
  }

  test("joinSizeByHistogram on disjoint keys is 0, not null") {
    val a = Seq(1, 2).toDF("k")
    val b = Seq(3, 4).toDF("k2")
    assert(Quality.joinSizeByHistogram(a, "k", b, "k2").as[Long].head() === 0L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val a = Seq((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0))
      .toDF("id", "name", "v")
    val b = Seq((1, "a", 1.0), (2, "b", 9.0), (4, "d", 4.0))
      .toDF("id", "name", "v")
    val r = Quality.snapshotDiff(a, b, "id")
      .orderBy("id")
      .as[(Int, String)].collect().toSeq
    assert(r === Seq((1, "unchanged"), (2, "changed"),
      (3, "removed"), (4, "added")))
  }

  test("snapshotDiff treats NULL payloads null-safely") {
    val a = Seq((1, Option.empty[String]), (2, Some("x")))
      .toDF("id", "name")
    val b = Seq((1, Option.empty[String]), (2, Option.empty[String]))
      .toDF("id", "name")
    val r = Quality.snapshotDiff(a, b, "id").orderBy("id")
      .as[(Int, String)].collect().toSeq
    assert(r === Seq((1, "unchanged"), (2, "changed")))
  }

  test("bootstrap CI brackets the point estimate and is rerun-stable") {
    val q = graft.queries.QualityQueries.bootstrap
    val r1 = q.run(spark, Sf001).collect()(0)
    val (n, mean, lo, hi) =
      (r1.getLong(0), r1.getDouble(1), r1.getDouble(2), r1.getDouble(3))
    assert(n > 0)
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    assert(hi - lo < mean, "95% CI of a 500-doc mean must be tight")
    // pure function of (replica, key): a rerun is bit-identical
    val r2 = q.run(spark, Sf001).collect()(0)
    assert(r1 === r2)
  }

  test("geometric noise ladder: boundary mapping, symmetry, and P(0) = 1/3") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val D = 281474976710656L // 2^48
    // exact boundary semantics: v strictly below a threshold takes its
    // rung; v equal to it takes the next
    val bounds = Seq(
      0L -> -6L, 2932031007403L -> -5L, 93824992236884L -> -1L,
      93824992236885L -> 0L, 187649984473770L -> 0L,
      187649984473771L -> 1L, (D - 1) -> 6L)
    val got = bounds.map(_._1).toDF("v")
      .select(col("v"), Quality.geometricNoise(col("v")).as("nz"))
      .as[(Long, Long)].collect().toMap
    bounds.foreach { case (v, want) => assert(got(v) === want, s"v=$v") }
    // distributional sanity over an md5-uniform key stream
    val vs = (1 to 6000).toDF("k")
      .select(conv(substring(md5(concat(lit("t:"), col("k"))), 1, 12), 16, 10)
        .cast("bigint").as("v"))
      .select(Quality.geometricNoise(col("v")).as("nz"))
      .as[Long].collect()
    val mean = vs.sum.toDouble / vs.length
    assert(math.abs(mean) < 0.1, s"mean=$mean")
    val p0 = vs.count(_ == 0L).toDouble / vs.length
    assert(math.abs(p0 - 1.0 / 3) < 0.03, s"p0=$p0")
    val p1 = vs.count(_ == 1L).toDouble / vs.length
    val pm1 = vs.count(_ == -1L).toDouble / vs.length
    assert(math.abs(p1 - 1.0 / 6) < 0.03 && math.abs(pm1 - 1.0 / 6) < 0.03)
  }

  test("ab test: the A/A split never reports significance; cells partition the users") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.QualityQueries.abTest.run(spark, Sf001).collect()
    assert(rows.length === 2)
    val aa = rows.find(_.getString(0) == "aa_split").get
    assert(aa.getAs[Int]("significant") === 0,
      "a hash split of one population is a true null — flagging it is a false positive")
    // each experiment's cells cover every user exactly once
    val users = graft.Tables.events(spark, Sf001)
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === users)
      assert(r.getAs[Long]("x_a") <= r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("x_b") <= r.getAs[Long]("n_b"))
    }
  }

  test("k-anonymity: no row below the group-size floor keeps its quasi values") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.QualityQueries.kAnonymity.run(spark, Sf001)
    val total = graft.Tables.customer(spark, Sf001).count()
    assert(rows.count() === total, "every customer must appear exactly once")
    // the invariant under test: unsafe ⇒ masked, safe ⇒ unmasked
    assert(rows.filter(col("is_safe") === 0 &&
      (col("segment_out") =!= "*" || col("band_out") =!= "*")).count() === 0)
    assert(rows.filter(col("is_safe") === 1 &&
      (col("segment_out") === "*" || col("band_out") === "*")).count() === 0)
    // group_n is the true size of each surviving (segment, band) group
    val recount = rows.filter(col("is_safe") === 1)
      .groupBy("segment_out", "band_out")
      .agg(count(lit(1)).as("again"), max("group_n").as("claimed"),
        min("group_n").as("claimed2"))
    assert(recount.filter(col("again") =!= col("claimed") ||
      col("again") =!= col("claimed2")).count() === 0)
  }

  test("compression ratio: repetition compresses, prose doesn't, inflate round-trips") {
    import spark.implicits._
    val prose = "The quick brown fox jumps over the lazy dog while " +
      "seventeen distinct words vary the byte stream considerably 0123456789."
    val docs = Seq(
      (1L, "a" * 2000),                      // pure repetition
      (2L, prose * 3),                       // prose-like
      (3L, ""),                              // empty
      (4L, (prose + "x").take(40))           // short doc, overhead-dominated
    ).toDF("doc_id", "text")
    val r = Quality.compressionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // n_bytes is the exact UTF-8 length
    assert(r.map(_.getLong(1)).toSeq === Seq(2000L, (prose.length * 3).toLong, 0L, 40L))
    val ratios = r.map(_.getDouble(3))
    assert(ratios(0) < 0.05, s"repetition should crush: ${ratios(0)}")
    assert(ratios(1) > 0.2 && ratios(1) < 1.0, s"prose mid-band: ${ratios(1)}")
    assert(ratios(2) === 1.0) // empty: defined, in-band
    assert(ratios(3) <= 1.2, s"short-doc overhead stays in band: ${ratios(3)}")
    assert(ratios(0) < ratios(1), "signal must order repetition below prose")
    // the bytes are REAL deflate: an independent Inflater recovers the input
    val deflated = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(("a" * 2000).getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
      d.end(); out.toByteArray
    }
    assert(deflated.length.toLong === r(0).getLong(2),
      "partition-shared Deflater must produce standard single-shot output")
    val inf = new java.util.zip.Inflater()
    inf.setInput(deflated)
    val back = new Array[Byte](4096)
    val sb = new StringBuilder
    while (!inf.finished()) {
      val n = inf.inflate(back)
      sb.appendAll(new String(back, 0, n, "UTF-8"))
    }
    inf.end()
    assert(sb.toString === "a" * 2000)
  }

  test("CUPED: theta/rho2 match a driver replica; adjustment preserves the pooled mean") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.QualityQueries.cuped.run(spark, Sf001).collect()
    assert(rows.length === 2)
    val theta = rows.head.getAs[Double]("theta")
    val rho2 = rows.head.getAs[Double]("rho2")
    assert(rho2 >= 0.0 && rho2 <= 1.0)
    // driver replica over the same (x, y) pairs
    import spark.implicits._
    val base = {
      def cents(y: Int) = graft.Tables.orders(spark, Sf001)
        .filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("v"))
      cents(1995).withColumnRenamed("v", "x")
        .join(cents(1996).withColumnRenamed("v", "y"), Seq("o_custkey"), "left")
        .select(col("o_custkey"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
        .as[(Long, Long, Long)].collect()
    }
    val n = base.length.toDouble
    def mean(f: ((Long, Long, Long)) => Long) = base.map(f).map(_.toDouble).sum / n
    val (mx, my) = (mean(_._2), mean(_._3))
    val cov = base.map(r => (r._2 - mx) * (r._3 - my)).sum / n
    val vx = base.map(r => (r._2 - mx) * (r._2 - mx)).sum / n
    val vy = base.map(r => (r._3 - my) * (r._3 - my)).sum / n
    assert(math.abs(theta - cov / vx) < 1e-9 * math.abs(theta).max(1.0))
    assert(math.abs(rho2 - cov * cov / (vx * vy)) < 1e-9)
    // CUPED is mean-preserving overall: Σ n_arm·adj_mean == Σ n_arm·raw ≈ Σ y
    val tot = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("adj_mean_cents")).sum
    val totRaw = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("raw_mean_cents")).sum
    assert(math.abs(tot - totRaw) < 1e-6 * math.abs(totRaw))
  }
}
