package graft.queries

import graft.SparkSpec

/** Invariants for the fifth session-7 batch — structural properties that
  * hold by construction, catching regressions the cell-exact gate can't
  * localize. */
class Round7cSpec extends SparkSpec {

  test("local clustering: lcc in [0,1], triangle-corner mass consistent") {
    val rows = GraphQueries.localClustering.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lcc = r.getAs[Double]("lcc")
      assert(lcc >= 0.0 && lcc <= 1.0)
      assert(r.getAs[Long]("tri") <=
        r.getAs[Long]("deg") * (r.getAs[Long]("deg") - 1) / 2)
    }
    // corner mass = 3 * global triangle count
    val tri3 = rows.map(_.getAs[Long]("tri")).sum
    val global = GraphQueries.triangles.run(spark, Sf001)
      .head().getAs[Long]("n_triangles")
    assert(tri3 === 3 * global)
  }

  test("link prediction: no predicted pair is an existing edge; RA sane") {
    val rows = GraphQueries.linkPredict.run(spark, Sf001).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      assert(r.getAs[Long]("cn") >= 1)
      // RA index of cn neighbors each of degree >= 2 is <= cn/2
      assert(r.getAs[Long]("ra_micro") <= r.getAs[Long]("cn") * 500000000000L)
    }
  }

  test("closeness: reached ball consistent with sum of hops") {
    val rows = GraphQueries.closeness.run(spark, Sf001).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_reached"); val s = r.getAs[Long]("sum_hops")
      assert(n >= 1)
      assert(s >= n - 1, "every non-anchor node is at hop >= 1")
      assert(s <= (n - 1) * 10, "radius cap bounds every distance")
    }
  }

  test("spearman within [-1,1] and kruskal non-negative") {
    val rho = QualityQueries.spearman.run(spark, Sf001)
      .head().getAs[Double]("rho")
    assert(rho >= -1.0 && rho <= 1.0)
    val h = QualityQueries.kruskalWallis.run(spark, Sf001)
      .head().getAs[Double]("h")
    assert(h >= 0.0)
  }

  test("runs test: runs bounded by sign counts") {
    val r = QualityQueries.runsTest.run(spark, Sf001).head()
    val a = r.getAs[Long]("n_above"); val b = r.getAs[Long]("n_below")
    val runs = r.getAs[Long]("runs")
    assert(runs >= 1 && runs <= 2 * math.min(a, b) + 1)
    assert(r.getAs[Long]("n_days") === a + b)
  }

  test("kappa <= 1 and consistent with observed agreement") {
    val r = EvalQueries.cohenKappa.run(spark, Sf001).head()
    val po = r.getAs[Double]("p_o"); val pe = r.getAs[Double]("p_e")
    assert(po >= 0.0 && po <= 1.0 && pe > 0.0 && pe < 1.0)
    assert(r.getAs[Double]("kappa") <= 1.0)
  }

  test("gains deciles: cumulative gain monotone, ends at 1") {
    val rows = EvalQueries.gainsDeciles.run(spark, Sf001).collect()
    val gains = rows.map(_.getAs[Double]("cum_gain"))
    assert(gains.zip(gains.tail).forall { case (x, y) => y >= x })
    assert(math.abs(gains.last - 1.0) < 1e-9)
    // decile 1 (top scores) must out-lift decile 10's rate
    assert(rows.head.getAs[Double]("resp_rate") >=
      rows.last.getAs[Double]("resp_rate"))
  }

  test("nelson-aalen: cumulative hazard non-decreasing, bounds KM") {
    val rows = SeriesQueries.nelsonAalen.run(spark, Sf001).collect()
    val h = rows.sortBy(_.getAs[Long]("t_days")).map(_.getAs[Long]("na_pico"))
    assert(h.zip(h.tail).forall { case (x, y) => y >= x })
    // exp(-H(t)) >= KM survival S(t) pointwise (standard inequality)
    val km = SeriesQueries.kaplanMeier.run(spark, Sf001).collect()
      .map(r => r.getAs[Long]("t_days") -> r.getAs[Double]("surv")).toMap
    rows.foreach { r =>
      km.get(r.getAs[Long]("t_days")).foreach { s =>
        assert(math.exp(-r.getAs[Long]("na_pico") / 1e12) >= s - 1e-9)
      }
    }
  }

  test("permutation entropy normalized into (0, 1]") {
    val r = SeriesQueries.permEntropy.run(spark, Sf001).head()
    val pe = r.getAs[Double]("pe_norm")
    assert(pe > 0.0 && pe <= 1.0 + 1e-12)
  }

  test("binary segmentation splits into non-empty halves") {
    val r = SeriesQueries.binarySegment.run(spark, Sf001).head()
    assert(r.getAs[Long]("n_left") >= 1 && r.getAs[Long]("n_right") >= 1)
    assert(r.getAs[Double]("mean_left_usd") > 0)
  }

  test("gini within [0,1); flesch components positive") {
    val g = AnalyticsQueries.lorenzGini.run(spark, Sf001)
      .head().getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    val fr = TextQueries.flesch.run(spark, Sf001).collect()
    assert(fr.nonEmpty)
    fr.foreach { r =>
      assert(r.getAs[Long]("syllables") <= r.getAs[Long]("words") * 10)
      assert(r.getAs[Long]("sentences") >= 1)
    }
  }
}
