package graft.queries

import graft.SparkSpec

/** Invariants for the session-9 closing batch (association, drift
  * metrics, blocking, graph indices). */
class Round7hSpec extends SparkSpec {

  test("cochran q: non-negative; blocks complete") {
    val r = StatsQueries.cochranQ.run(spark, Sf001).head()
    assert(r.getAs[Double]("q_cochran") >= -1e-9)
    assert(r.getAs[Long]("n_blocks") >= 1)
  }

  test("hellinger and bhattacharyya are complementary and bounded") {
    val r = StatsQueries.hellinger.run(spark, Sf001).head()
    val bc = r.getAs[Double]("bhattacharyya")
    val h = r.getAs[Double]("hellinger")
    assert(bc >= 0.0 && bc <= 1.0 + 1e-9)
    assert(h >= 0.0 && h <= 1.0)
    assert(math.abs(h - math.sqrt(math.max(0.0, 1.0 - bc))) < 1e-5)
  }

  test("theil u in [0,1]; mutual information bounded by H(Y)") {
    val r = StatsQueries.theilU.run(spark, Sf001).head()
    val u = r.getAs[Double]("theil_u")
    val i = r.getAs[Double]("i_nats")
    val hy = r.getAs[Double]("h_y")
    assert(u >= -1e-6 && u <= 1.0 + 1e-6)
    assert(i >= -1e-6 && i <= hy + 1e-6)
    assert(hy > 0.0 && hy <= math.log(3.0) + 1e-9) // 3 return flags
  }

  test("cvm discrepancy non-negative and bounded by 1") {
    val r = StatsQueries.cvm.run(spark, Sf001).head()
    val d = r.getAs[Double]("cvm_d")
    assert(d >= 0.0 && d <= 1.0)
  }

  test("phonetic blocking: members partition parts; ratio in (0,1]") {
    val rows = ExtendedQueries.phoneticBlock.run(spark, Sf001).collect()
    val total = rows.map(_.getAs[Long]("n_members")).sum
    assert(total === graft.Tables.part(spark, Sf001).count())
    val ratio = rows.head.getAs[Double]("reduction_ratio")
    assert(ratio > 0.0 && ratio <= 1.0)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_members")
      assert(r.getAs[Long]("n_pairs") === n * (n - 1) / 2)
    }
  }

  test("adamic-adar pairs are non-adjacent; aa positive") {
    val rows = GraphQueries.adamicAdar.run(spark, Sf001).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      assert(r.getAs[Long]("aa_nano") > 0L)
      // AA of cn common neighbors with deg >= 2 is at most cn / ln 2
      assert(r.getAs[Double]("aa") <=
        r.getAs[Long]("cn") / math.log(2.0) + 1e-6)
    }
  }

  test("pr curve: recall monotone, ends at 1; pr_auc in [0,1]") {
    val rows = EvalQueries.prCurve.run(spark, Sf001).collect()
    val recalls = rows.map(_.getAs[Double]("recall")) // bin DESC order
    assert(recalls.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(math.abs(recalls.last - 1.0) < 1e-9)
    val auc = rows.head.getAs[Double]("pr_auc")
    assert(auc >= 0.0 && auc <= 1.0 + 1e-9)
    rows.foreach { r =>
      val p = r.getAs[Double]("precision")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("brier within [0,1]; beats neither bound trivially") {
    val r = EvalQueries.brier.run(spark, Sf001).head()
    val b = r.getAs[Double]("brier")
    assert(b >= 0.0 && b <= 1.0)
    assert(r.getAs[Double]("brier_base_rate") >= 0.0)
  }

  test("embedding drift: cosine in [-1,1]; l2 consistent with cosine") {
    val r = SimilarityQueries.embeddingDrift.run(spark, Sf001).head()
    val c = r.getAs[Double]("centroid_cosine")
    assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    assert(r.getAs[Double]("centroid_l2") >= 0.0)
    assert(r.getAs[Long]("n0") > 0 && r.getAs[Long]("n1") > 0)
  }

  test("weibull fit: positive shape and scale; enough plot points") {
    val r = StatsQueries.weibullFit.run(spark, Sf001).head()
    assert(r.getAs[Long]("n_points") >= 10)
    assert(r.getAs[Double]("shape") > 0.0)
    assert(r.getAs[Double]("scale_days") > 0.0)
  }

  test("weibull probability plot recovers known parameters") {
    import spark.implicits._
    // exact Weibull quantiles: S(t_i) = i/101 at t_i = λ(−ln S)^(1/k)
    val (k0, lam) = (1.7, 40.0)
    val durs = (1 to 100).map { i =>
      val sTgt = i / 101.0
      (math.round(lam * math.pow(-math.log(sTgt), 1.0 / k0)) max 1L, 1)
    }
    val fit = graft.ops.Series.kaplanMeier(
      durs.toDF("dur", "event"), "dur", "event")
      .filter(org.apache.spark.sql.functions.col("surv") > 0.0 &&
        org.apache.spark.sql.functions.col("surv") < 1.0 &&
        org.apache.spark.sql.functions.col("t") >= 1)
      .selectExpr("ln(CAST(t AS DOUBLE)) AS x", "ln(-ln(surv)) AS y")
      .collect()
    val n = fit.length.toDouble
    val sx = fit.map(_.getDouble(0)).sum; val sy = fit.map(_.getDouble(1)).sum
    val sxx = fit.map(r => r.getDouble(0) * r.getDouble(0)).sum
    val sxy = fit.map(r => r.getDouble(0) * r.getDouble(1)).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    // duration rounding + plot bias allow a loose but real band
    assert(math.abs(slope - k0) < 0.35, s"slope $slope vs $k0")
  }

  test("propensity strata: treated+control partition lineitem") {
    val r = StatsQueries.propensityStrata.run(spark, Sf001).head()
    assert(r.getAs[Long]("n_treated") + r.getAs[Long]("n_control") ===
      graft.Tables.lineitem(spark, Sf001).count())
    // both estimates finite
    assert(!r.getAs[Double]("att_usd").isNaN)
    assert(!r.getAs[Double]("naive_diff_usd").isNaN)
  }

  test("growth accounting: dau = new + retained + resurrected daily") {
    val rows = EventQueries.growthAccounting.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") === r.getAs[Long]("new_users") +
        r.getAs[Long]("retained") + r.getAs[Long]("resurrected"))
      assert(r.getAs[Long]("churned_after") <= r.getAs[Long]("dau"))
    }
    // day 1 is all-new
    val first = rows.minBy(_.getAs[java.sql.Timestamp]("day").getTime)
    assert(first.getAs[Long]("new_users") === first.getAs[Long]("dau"))
  }

  test("page-hinkley: alarm day consistent with the detection flag") {
    val r = EventQueries.pageHinkley.run(spark, Sf001).head()
    val det = r.getAs[Int]("drift_detected")
    val day = r.getAs[Int]("alarm_day")
    assert((det == 1) === (day >= 0))
    assert(r.getAs[Double]("max_ph_usd") >= 0.0)
  }

  test("l-moments: ratios bounded (|t3|,|t4| <= 1), positive scale") {
    val r = StatsQueries.lMoments.run(spark, Sf001).head()
    assert(r.getAs[Double]("l2_usd") > 0.0)
    assert(math.abs(r.getAs[Double]("t3_lskew")) <= 1.0)
    assert(math.abs(r.getAs[Double]("t4_lkurt")) <= 1.0)
    assert(r.getAs[Double]("l_cv") > 0.0 && r.getAs[Double]("l_cv") < 1.0)
  }

  test("shapley r2: attributions sum to the full-model r2") {
    val r = StatsQueries.shapleyR2.run(spark, Sf001).head()
    val full = r.getAs[Double]("r2_full")
    assert(full >= 0.0 && full <= 1.0)
    assert(math.abs(r.getAs[Double]("phi_qty") +
      r.getAs[Double]("phi_disc") - full) < 3e-6)
  }

  test("ab srm: bucket counts partition docs; alarm consistent with chi2") {
    val r = StatsQueries.abSrm.run(spark, Sf001).head()
    assert(r.getAs[Long]("o_train") + r.getAs[Long]("o_valid") +
      r.getAs[Long]("o_test") === r.getAs[Long]("n_docs"))
    // a .05-level test may legitimately alarm on a 500-doc sample (it
    // does here: chi2 ≈ 6.54); the invariant is flag/statistic agreement
    assert((r.getAs[Int]("srm_alarm") === 1) ===
      (r.getAs[Double]("chi2_srm") > 5.9915))
  }

  test("stickiness: dau <= wau, ratio in (0,1]") {
    val rows = EventQueries.stickiness.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0)
    }
  }

  test("ks gof: d in [0,1] with a populated argmax") {
    val r = StatsQueries.ksGof.run(spark, Sf001).head()
    val d = r.getAs[Double]("ks_d")
    assert(d >= 0.0 && d <= 1.0)
    assert(r.getAs[Int]("at_t_days") >= 1)
    assert(r.getAs[Long]("n_gaps") > 100)
  }

  test("abc analysis: classes ordered A<=B<=C along cum share; covers brands") {
    val rows = AnalyticsQueries.abcAnalysis.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val classes = rows.map(_.getAs[String]("abc_class"))
    // cum_share ascending → class sequence must be non-decreasing
    assert(classes.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(classes.contains("A") && classes.contains("C"))
    val lastShare = rows.last.getAs[Double]("cum_share")
    assert(math.abs(lastShare - 1.0) < 1e-6)
  }

  test("ltv triangle: cumulative monotone within each cohort") {
    val rows = EventQueries.ltvTriangle.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Timestamp]("cohort_day")).foreach {
      case (_, rs) =>
        val byAge = rs.sortBy(_.getAs[Int]("age_week"))
        val cums = byAge.map(_.getAs[Double]("cum_rev"))
        assert(cums.sliding(2).forall(p => p.length < 2 ||
          p(0) <= p(1) + 1e-9))
    }
  }

  test("backtest: lag-1 beats or ties lag-7 on an i.i.d.-ish series") {
    val r = SeriesQueries.backtestNaive.run(spark, Sf001).head()
    assert(r.getAs[Long]("n_eval") > 100)
    Seq("mape_lag1", "mape_lag7", "mape_ma7").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v > 0.0 && v < 10.0, c)
    }
    // the MA-7 smoother must not be worse than the single noisiest lag
    assert(r.getAs[Double]("mape_ma7") <=
      math.max(r.getAs[Double]("mape_lag1"),
        r.getAs[Double]("mape_lag7")) + 1e-9)
  }

  test("pdp: monotone in discount under the positive pinned coefficient") {
    val rows = StatsQueries.pdp.run(spark, Sf001).collect()
      .sortBy(_.getAs[Int]("disc_pct"))
    assert(rows.length === 11)
    val phats = rows.map(_.getAs[Double]("pdp_phat"))
    assert(phats.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    phats.foreach(p => assert(p > 0.0 && p < 1.0))
    // every lineitem row appears at each actual discount level exactly once
    val total = rows.map(_.getAs[Long]("n_at_level")).sum
    assert(total === graft.Tables.lineitem(spark, Sf001).count())
  }

  test("simpsons check: flag consistent with the two odds ratios") {
    val r = StatsQueries.simpsonsCheck.run(spark, Sf001).head()
    val p = r.getAs[Double]("or_pooled"); val m = r.getAs[Double]("or_mh")
    assert(p > 0.0 && m > 0.0)
    assert((r.getAs[Int]("paradox_flag") === 1) ===
      ((p > 1.0 && m < 1.0) || (p < 1.0 && m > 1.0)))
  }

  test("bland-altman: limits bracket the bias symmetrically") {
    val r = StatsQueries.blandAltman.run(spark, Sf001).head()
    val b = r.getAs[Double]("bias_usd")
    val lo = r.getAs[Double]("loa_lower_usd")
    val hi = r.getAs[Double]("loa_upper_usd")
    assert(lo <= b && b <= hi)
    assert(math.abs((hi - b) - (b - lo)) < 0.05) // symmetric to rounding
  }

  test("rank-biserial within [-1, 1]") {
    val r = StatsQueries.rankBiserial.run(spark, Sf001).head()
    val v = r.getAs[Double]("rank_biserial")
    assert(v >= -1.0 && v <= 1.0)
  }

  test("dedup eval: zero false positives; verdict green at this SF") {
    val r = TextQueries.dedupEval.run(spark, Sf001).head()
    assert(r.getAs[Long]("n_false_pos") === 0L)
    assert(r.getAs[Int]("recall_ok") === 1)
    assert(r.getAs[Long]("n_truth") >= 1L)
  }

  test("moran/geary: opposite signals agree (I high <=> C low around 1)") {
    val r = GeoQueries.moranGeary.run(spark, Sf001).head()
    val i = r.getAs[Double]("moran_i")
    val c = r.getAs[Double]("geary_c")
    assert(i >= -1.1 && i <= 1.1)
    assert(c >= 0.0 && c <= 3.0)
    // the scattered plane is near-random: I near 0, C near 1
    assert(math.abs(i) < 0.5 && math.abs(c - 1.0) < 0.5)
    assert(r.getAs[Long]("w_pairs") > 0)
  }

  test("effect sizes: internally consistent panel") {
    val r = StatsQueries.effectSizes.run(spark, Sf001).head()
    val rr = r.getAs[Double]("risk_ratio")
    val or = r.getAs[Double]("odds_ratio")
    val rd = r.getAs[Double]("risk_diff")
    val h = r.getAs[Double]("cohens_h")
    assert(rr > 0.0 && or > 0.0)
    // OR is farther from 1 than RR on the same table (both same side)
    assert((rr >= 1.0) === (or >= 1.0))
    assert((rd >= 0.0) === (rr >= 1.0))
    assert((h >= 0.0) === (rd >= 0.0))
  }

  test("rich club: monotone counts along the ladder; phi in [0,1]") {
    val r = GraphQueries.richClub.run(spark, Sf001).head()
    val (n4, n8, n16) = (r.getAs[Long]("n4"), r.getAs[Long]("n8"),
      r.getAs[Long]("n16"))
    assert(n4 >= n8 && n8 >= n16)
    assert(r.getAs[Long]("e4") >= r.getAs[Long]("e8"))
    Seq("phi4", "phi8", "phi16").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, c)
    }
  }
}
