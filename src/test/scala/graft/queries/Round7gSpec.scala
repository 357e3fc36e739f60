package graft.queries

import graft.SparkSpec

/** Invariants for the session-9 parametric-statistics batch. */
class Round7gSpec extends SparkSpec {

  test("anova: F non-negative; group counts partition the orders") {
    val r = StatsQueries.anova.run(spark, Sf001).head()
    assert(r.getAs[Double]("f") >= 0.0)
    assert(r.getAs[Long]("n") ===
      graft.Tables.orders(spark, Sf001).count())
  }

  test("welch t: symmetric under group swap (|t| invariant), df bounded") {
    val r = StatsQueries.welchT.run(spark, Sf001).head()
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val df = r.getAs[Double]("df_welch")
    // Welch df lies between min(n1,n2)−1 and n1+n2−2
    assert(df >= math.min(n1, n2) - 1.0 && df <= n1 + n2 - 2.0)
  }

  test("brown-forsythe F is non-negative and uses every customer") {
    val r = StatsQueries.levene.run(spark, Sf001).head()
    assert(r.getAs[Double]("f_bf") >= 0.0)
    assert(r.getAs[Long]("n") ===
      graft.Tables.customer(spark, Sf001).count())
  }

  test("mantel-haenszel: OR positive; chi2 non-negative") {
    val r = StatsQueries.mantelHaenszel.run(spark, Sf001).head()
    assert(r.getAs[Double]("or_mh") > 0.0)
    assert(r.getAs[Double]("chi2_cmh") >= 0.0)
  }

  test("pacf lag-1 equals acf lag-1; all pacf in [-1, 1]") {
    val p = StatsQueries.pacf.run(spark, Sf001).head()
    val acf1 = graft.ops.Series.autocorr(
      graft.Tables.orders(spark, Sf001)
        .groupBy(org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("o_orderdate")),
          org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
          .as("t"))
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("o_totalprice")
            .cast("decimal(18,2)")).cast("double").as("x")),
      "t", "x", maxLag = 1)
      .head().getAs[Double]("acf")
    assert(p.getAs[Double]("pacf1") === acf1)
    Seq("pacf1", "pacf2", "pacf3").foreach { c =>
      assert(math.abs(p.getAs[Double](c)) <= 1.0)
    }
  }

  test("ccf at lag 0 is plain Pearson of the two daily series; |ccf|<=1") {
    val rows = StatsQueries.ccf.run(spark, Sf001).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      val v = r.getAs[Double]("ccf")
      assert(math.abs(v) <= 1.0)
    }
    // lag 0 has the most pairs (no trimming at the series edges)
    val n0 = rows.find(_.getAs[Int]("lag") == 0).get.getAs[Long]("n_pairs")
    rows.foreach(r => assert(r.getAs[Long]("n_pairs") <= n0))
  }

  test("periodogram amplitudes are non-negative and finite") {
    val r = StatsQueries.periodogram.run(spark, Sf001).head()
    Seq("amp_weekly", "amp_half_week", "amp_third_week").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && !v.isNaN && !v.isInfinite)
    }
  }

  test("js divergence within [0, 1]; symmetric by construction") {
    val r = StatsQueries.jsDivergence.run(spark, Sf001).head()
    val js = r.getAs[Double]("js")
    assert(js >= 0.0 && js <= 1.0)
  }

  test("durbin-watson within [0, 4]; rho_hat consistent with dw") {
    val r = StatsQueries.durbinWatson.run(spark, Sf001).head()
    val dw = r.getAs[Double]("dw")
    assert(dw >= 0.0 && dw <= 4.0)
    assert(math.abs(r.getAs[Double]("rho_hat") - (1.0 - dw / 2.0)) < 2e-6)
  }

  test("breusch-pagan: bp = n * r2 with r2 in [0, 1]") {
    val r = StatsQueries.breuschPagan.run(spark, Sf001).head()
    val r2 = r.getAs[Double]("r2_aux")
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(r.getAs[Double]("bp") -
      r.getAs[Long]("n_days") * r2) < 0.01)
  }

  test("vif: each factor at least 1 (orthogonal floor)") {
    val r = StatsQueries.vif.run(spark, Sf001).head()
    Seq("vif_qty", "vif_price", "vif_disc").foreach { c =>
      assert(r.getAs[Double](c) >= 1.0 - 1e-6, c)
    }
  }

  test("hosmer-lemeshow: non-negative, covers every lineitem row") {
    val r = StatsQueries.hosmerLemeshow.run(spark, Sf001).head()
    assert(r.getAs[Double]("hl") >= 0.0)
    assert(r.getAs[Long]("n_rows") ===
      graft.Tables.lineitem(spark, Sf001).count())
  }

  test("hill tail: alpha above 1, tail bounded by the node count") {
    val r = GraphQueries.hillTail.run(spark, Sf001).head()
    assert(r.getAs[Double]("alpha") > 1.0)
    assert(r.getAs[Long]("k_tail") >= 1L)
  }

  test("poisson irls: converged fit with every verdict green") {
    val r = StatsQueries.poissonIrls.run(spark, Sf001).head()
    assert(r.getAs[Int]("deviance_decreasing") === 1)
    assert(r.getAs[Int]("grad_ok") === 1)
    assert(r.getAs[Int]("weights_finite") === 1)
  }

  test("poisson trainer recovers a known rate structure") {
    import spark.implicits._
    // two regimes: mu = 4 when x = 0, mu = 12 when x = 1 → slope ln 3
    val rows = (0 until 200).map { i =>
      val x = i % 2
      val mu = if (x == 1) 12.0 else 4.0
      // deterministic "counts": alternate around mu so the mean is exact
      val y = mu + (if (i % 4 < 2) 1.0 else -1.0)
      (y, x.toDouble)
    }
    val fit = graft.ops.LogReg.trainPoisson(rows.toDF("y", "x"), "y",
      Seq("x"), iters = 6)
    assert(math.abs(fit.weights(0) - math.log(4.0)) < 0.02)
    assert(math.abs(fit.weights(1) - math.log(3.0)) < 0.03)
  }

  test("friedman: chi2 bounded by the no-tie maximum 2b") {
    val r = StatsQueries.friedman.run(spark, Sf001).head()
    val b = r.getAs[Long]("n_blocks")
    val chi2 = r.getAs[Double]("chi2_f")
    // k = 3: max chi2 (perfectly consistent ranking) = b·(k−1) = 2b
    assert(chi2 >= -1e-6 && chi2 <= 2.0 * b + 1e-6)
    assert(b >= 1)
  }

  test("grubbs: g within the hard bound (n-1)/sqrt(n)") {
    val r = StatsQueries.grubbs.run(spark, Sf001).head()
    val n = r.getAs[Long]("n_days").toDouble
    val g = r.getAs[Double]("g")
    assert(g > 0.0 && g <= (n - 1.0) / math.sqrt(n) + 1e-9)
  }

  test("sprt: decision consistent with the boundary at the stop day") {
    val r = StatsQueries.sprt.run(spark, Sf001).head()
    val dec = r.getAs[String]("decision")
    val llr = r.getAs[Double]("llr_at_stop")
    val b = math.log(19.0)
    dec match {
      case "H1" => assert(llr >= b - 1e-6)
      case "H0" => assert(llr <= -b + 1e-6)
      case _    => assert(r.getAs[Int]("stop_day") === -1)
    }
  }

  test("t-closeness: emd in [0,1]; every quasi-group audited") {
    val rows = StatsQueries.tCloseness.run(spark, Sf001).collect()
    rows.foreach { r =>
      val e = r.getAs[Long]("emd_nano")
      assert(e >= 0L && e <= 1000000000L)
      val t = r.getAs[Double]("t_close")
      assert(math.abs(t - e / 1e9) < 1e-6)
    }
    // groups partition the (customer ⋈ orders) rows
    val total = rows.map(_.getAs[Long]("ng")).sum
    assert(total === graft.Tables.customer(spark, Sf001)
      .join(graft.Tables.orders(spark, Sf001),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"))
      .count())
  }
}
