package graft.queries

import graft.SparkSpec

/** Invariants for the sixth session-8 batch — structural properties that
  * hold by construction, catching regressions the cell-exact gate can't
  * localize. */
class Round7dSpec extends SparkSpec {

  test("ktruss: every surviving edge is a frequent edge, converged flag set") {
    val rows = GraphQueries.ktruss.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      assert(r.getAs[Int]("converged_ok") === 1)
    }
  }

  test("kendall: pair counts partition n(n-1)/2; tau within [-1,1]") {
    val r = SeriesQueries.kendallTau.run(spark, Sf001).head()
    val n = r.getAs[Long]("n_days")
    val total = r.getAs[Long]("concordant") + r.getAs[Long]("discordant") +
      r.getAs[Long]("tied")
    assert(total === n * (n - 1) / 2)
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("ljung-box: Q non-negative and zero iff all acf zero") {
    val r = SeriesQueries.ljungBox.run(spark, Sf001).head()
    assert(r.getAs[Double]("q_stat") >= 0.0)
  }

  test("conformal: coverage near nominal 90% on exchangeable splits") {
    val r = SeriesQueries.conformal.run(spark, Sf001).head()
    val cov = r.getAs[Double]("coverage")
    // finite-sample band: the guarantee is E[cov] >= 0.9; a single draw
    // on ~1200 test days concentrates within a few points
    assert(cov >= 0.85 && cov <= 1.0, s"coverage $cov outside [0.85, 1]")
    assert(r.getAs[Double]("radius_usd") > 0.0)
  }

  test("heaps: vocabulary checkpoints grow and beta in (0,1)") {
    val r = TextQueries.heapsLaw.run(spark, Sf001).head()
    assert(r.getAs[Long]("v_min") < r.getAs[Long]("v_max"),
      "shingle vocabulary must grow across prefixes")
    val beta = r.getAs[Double]("beta")
    assert(beta > 0.0 && beta < 1.0)
  }

  test("entropy rate: bounded by marginal entropy (conditioning reduces)") {
    val r = SeriesQueries.entropyRate.run(spark, Sf001).head()
    assert(r.getAs[Double]("h_rate") >= 0.0)
    assert(r.getAs[Double]("h_rate") <= r.getAs[Double]("h_marginal") + 1e-9)
  }

  test("silhouette: member counts cover the corpus; scores within [-eps,1]") {
    val rows = CurationQueries.silhouette.run(spark, Sf001).collect()
    assert(rows.length === 8)
    val total = rows.map(_.getAs[Long]("n_members")).sum
    val n = graft.Tables.embeddings(spark, Sf001).count()
    assert(total === n)
    rows.foreach { r =>
      val s = r.getAs[Double]("mean_sil")
      assert(s >= -1.0 && s <= 1.0)
    }
  }

  test("fertility: at least one subword per word in every language") {
    val rows = TextQueries.fertility.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
    }
  }

  test("pmi: all pairs meet the support floor; counts consistent") {
    val rows = FeatureQueries.pmi.run(spark, Sf001).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[Long]("c12") >= 20)
      assert(r.getAs[Long]("c1") >= 1 && r.getAs[Long]("c2") >= 1)
    }
  }

  test("partial correlation composes its three pairwise r's consistently") {
    val r = QualityQueries.partialCorr.run(spark, Sf001).head()
    val (rxy, rxz, ryz) = (r.getAs[Double]("r_xy"), r.getAs[Double]("r_xz"),
      r.getAs[Double]("r_yz"))
    val expected = (rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    assert(math.abs(r.getAs[Double]("r_xy_given_z") - expected) < 1e-5)
  }

  test("cronbach alpha <= 1; lorenz gini matches a direct O(n^2) check") {
    assert(QualityQueries.cronbachAlpha.run(spark, Sf001)
      .head().getAs[Double]("alpha") <= 1.0)
    // direct pairwise |b_i - b_j| on the sf0.001 bins (150 customers)
    val bins = graft.Tables.orders(spark, Sf001)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) " +
          "DIV 10000").as("b"))
      .collect().map(_.getAs[Long]("b"))
    val n = bins.length.toLong
    val s = bins.sum
    val sad = (for (x <- bins; y <- bins) yield math.abs(x - y)).sum
    val direct = sad.toDouble / (2.0 * n * s)
    val got = AnalyticsQueries.lorenzGini.run(spark, Sf001)
      .head().getAs[Double]("gini")
    assert(math.abs(got - direct) < 1e-6, s"gini $got vs direct $direct")
  }
}
