package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {

  test("AUC: rank-sum form equals the brute-force pairwise probability") {
    val row = EvalQueries.auc.run(spark, Sf001).collect().head
    val auc = row.getAs[Double]("auc")
    val p = row.getAs[Long]("n_pos")
    val n = row.getAs[Long]("n_neg")
    assert(p > 0 && n > 0)
    // n_items >= 4 really does track price: the signal is informative
    assert(auc > 0.6, s"label/score should correlate, got $auc")
    assert(auc < 1.0, s"and not degenerately, got $auc")
    // brute-force: P(score_pos > score_neg) + 0.5 P(=) over all pairs —
    // O(P*N) only at spec scale; the query never forms pairs
    import spark.implicits._
    val sc = graft.Tables.orders(spark, Sf001)
      .join(
        graft.Tables.lineitem(spark, Sf001)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
              .as("rev")),
        Seq("o_orderkey"), "left")
      .select(coalesce(col("rev"), lit(0.0)).as("score"),
        (coalesce(col("n_items"), lit(0L)) >= 4).cast("int").as("label"))
      .as[(Double, Int)].collect()
    val pos = sc.filter(_._2 == 1).map(_._1)
    val neg = sc.filter(_._2 == 0).map(_._1)
    var wins = 0.0
    for (a <- pos; b <- neg)
      wins += (if (a > b) 1.0 else if (a == b) 0.5 else 0.0)
    val brute = wins / (pos.length.toDouble * neg.length.toDouble)
    assert(math.abs(auc - brute) < 1e-12, s"rank-sum $auc vs pairwise $brute")
  }

  test("AUC tie handling: all-tied scores give exactly 0.5") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 1), (2L, 10.0, 0), (3L, 10.0, 1), (4L, 10.0, 0))
      .toDF("id", "score", "label")
    // replay the query's reduction on a frame where EVERY score ties
    val ranked = graft.ops.Ranks.globalRank(df,
      Seq(col("score"), col("id")), 4, "__rn")
    val agg = ranked.groupBy("score").agg(
      min("__rn").as("mn"), max("__rn").as("mx"),
      sum(col("label").cast("long")).as("pos"),
      count(lit(1)).as("cnt"))
      .agg(sum(col("pos") * (col("mn") + col("mx"))).as("sum2"),
        sum(col("pos")).as("p"), sum(col("cnt") - col("pos")).as("n"))
      .select(((col("sum2") - col("p") * (col("p") + 1)).cast("double") /
        (col("p") * col("n") * 2L).cast("double")).as("auc"))
      .collect().head.getDouble(0)
    assert(agg === 0.5)
  }

  test("confusion matrix cells partition the scored set; F1 is the harmonic mean") {
    val r = EvalQueries.confusion.run(spark, Sf001).collect().head
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    val total = graft.Tables.orders(spark, Sf001).count()
    assert(tp + fp + fn + tn === total)
    val prec = r.getAs[Double]("precision")
    val rec = r.getAs[Double]("recall")
    val f1 = r.getAs[Double]("f1")
    assert(math.abs(f1 - 2 * prec * rec / (prec + rec)) < 1e-12)
    assert(prec > 0.5, "a 200k price threshold should be precise for >=4 items")
  }

  test("grouped AUC: binned rank-sum equals a brute-force binned pairwise count") {
    val rows = EvalQueries.aucGrouped.run(spark, Sf001).collect()
    assert(rows.length === 5, "one row per market segment")
    import spark.implicits._
    val base = graft.Tables.orders(spark, Sf001).select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, Sf001)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("rev")), Seq("o_orderkey"), "left")
      .join(graft.Tables.customer(spark, Sf001)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("seg")),
        "o_custkey")
      .select(col("seg"),
        least(floor(coalesce(col("rev"), lit(0.0)) / 800.0), lit(999.0))
          .cast("long").as("bin"),
        (coalesce(col("n_items"), lit(0L)) >= 4).cast("int").as("label"))
      .as[(String, Long, Int)].collect()
    rows.foreach { r =>
      val seg = r.getAs[String]("seg")
      val pos = base.filter(x => x._1 == seg && x._3 == 1).map(_._2)
      val neg = base.filter(x => x._1 == seg && x._3 == 0).map(_._2)
      var wins = 0.0
      for (a <- pos; b <- neg)
        wins += (if (a > b) 1.0 else if (a == b) 0.5 else 0.0)
      val brute = wins / (pos.length.toDouble * neg.length)
      assert(math.abs(r.getAs[Double]("auc") - brute) < 1e-12, seg)
      assert(r.getAs[Long]("n_pos") === pos.length.toLong)
    }
  }

  test("MRR: reciprocal ranks recompute from first_rank; combine is fixed-order") {
    val rows = EvalQueries.mrr.run(spark, Sf001).collect()
    assert(rows.map(_.getAs[String]("query")).toSeq ===
      Seq("data", "model", "stream"))
    rows.foreach { r =>
      val fr = r.getAs[Int]("first_rank")
      assert(fr >= 0 && fr <= 20)
      val want = if (fr > 0) 1.0 / fr else 0.0
      assert(r.getAs[Double]("rr") === want)
    }
    val byQ = rows.map(r => r.getAs[String]("query") -> r.getAs[Double]("rr")).toMap
    val mrr = (byQ("data") + byQ("model") + byQ("stream")) / 3.0
    rows.foreach(r => assert(r.getAs[Double]("mrr") === mrr))
    assert(mrr > 0.0, "at least one query should find an 'en' doc in top-20")
  }

  test("KS test: statistic recomputes from the scaled integer and is in [0,1]") {
    val r = QualityQueries.ksTest.run(spark, Sf001).collect().head
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val scaled = r.getAs[Long]("ks_scaled")
    val ks = r.getAs[Double]("ks_stat")
    assert(n1 > 0 && n2 > 0)
    assert(ks === scaled.toDouble / (n1 * n2).toDouble)
    assert(ks >= 0.0 && ks <= 1.0)
    // brute-force the binned CDF distance driver-side
    import spark.implicits._
    val pts = graft.Tables.orders(spark, Sf001)
      .join(graft.Tables.customer(spark, Sf001)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("seg")),
        "o_custkey")
      .filter(col("seg").isin("AUTOMOBILE", "BUILDING"))
      .select(col("seg"),
        least(floor(col("o_totalprice") / 400.0), lit(1999.0)).cast("long")
          .as("bin"))
      .as[(String, Long)].collect()
    val a = pts.filter(_._1 == "AUTOMOBILE").map(_._2)
    val b = pts.filter(_._1 == "BUILDING").map(_._2)
    val want = (0L to 1999L).map { t =>
      math.abs(b.length.toLong * a.count(_ <= t) -
        a.length.toLong * b.count(_ <= t))
    }.max
    assert(scaled === want)
  }

  test("calibration bins cover all orders and frac_pos is monotone-ish in score") {
    val rows = EvalQueries.calibration.run(spark, Sf001).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ===
      graft.Tables.orders(spark, Sf001).count())
    assert(rows.forall(r => r.getAs[Int]("bin") >= 0 && r.getAs[Int]("bin") <= 9))
    // the top bin must be purer than the bottom bin (signal direction)
    val byBin = rows.map(r => r.getAs[Int]("bin") -> r.getAs[Double]("frac_pos")).toMap
    assert(byBin(byBin.keys.max) > byBin(byBin.keys.min))
    // mean_score sits inside its bin's [lo, hi) span (top bin open)
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val m = r.getAs[Double]("mean_score")
      assert(m >= bin * 80000.0)
      if (bin < 9) assert(m < (bin + 1) * 80000.0)
    }
  }
}
