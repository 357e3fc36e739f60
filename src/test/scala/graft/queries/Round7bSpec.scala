package graft.queries

import graft.SparkSpec

/** Invariants for the late-session-7 operators — properties that hold by
  * construction and catch structural regressions the cell-exact gate
  * can't localize. */
class Round7bSpec extends SparkSpec {

  test("matrix profile: exclusion zone respected, distances non-negative") {
    val rows = SeriesQueries.matrixProfile.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wt = r.getAs[Long]("wt"); val nn = r.getAs[Long]("nn_wt")
      assert(math.abs(wt - nn) >= 7, s"window $wt matched inside exclusion")
      assert(r.getAs[Long]("mp_dist2") >= 0L)
    }
    // the profile is symmetric-bounded: if j is i's NN at distance d,
    // then j's own profile value is <= d (j has i available as a match)
    val prof = rows.map(r => r.getAs[Long]("wt") -> r.getAs[Long]("mp_dist2")).toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("mp_dist2"); val nn = r.getAs[Long]("nn_wt")
      assert(prof(nn) <= d,
        s"profile(${nn}) = ${prof(nn)} > $d = dist to it from ${r.getAs[Long]("wt")}")
    }
  }

  test("graph diameter: two-sweep bound at least the anchor eccentricity") {
    val r = GraphQueries.graphDiameter.run(spark, Sf001).head()
    assert(r.getAs[Int]("diameter_lb") >= r.getAs[Int]("ecc_anchor"),
      "the far node's eccentricity can never undercut the anchor's")
    assert(r.getAs[Long]("n_reached") >= 1L)
  }

  test("als rank-1: factor scores positive and rank-correlated with volume") {
    val rows = MlQueries.alsRank1.run(spark, Sf001).collect()
    assert(rows.length === 15)
    rows.foreach { r =>
      assert(r.getAs[Double]("factor_score") > 0.0)
      assert(r.getAs[Long]("qty_total") > 0L)
    }
    val scores = rows.map(_.getAs[Double]("factor_score")).toSeq
    assert(scores === scores.sorted.reverse, "output is ordered by score")
  }

  test("weighted jaccard: scores within (0, 1], min <= max side sums") {
    val rows = TextQueries.weightedJaccard.run(spark, Sf001).collect()
    rows.foreach { r =>
      val wj = r.getAs[Double]("wjac")
      assert(wj > 0.0 && wj <= 1.0)
      assert(r.getAs[Long]("smin") <= r.getAs[Long]("smax"))
      assert(wj >= 0.4 - 1e-12, "threshold filter must hold")
    }
  }

  test("dp quantile: chosen bin concentrates on the true median at n >> 1/eps") {
    val r = QualityQueries.dpQuantile.run(spark, Sf001).head()
    assert(r.getAs[Long]("chosen_bin") === r.getAs[Long]("true_med_bin"),
      "with interval utility and n in the thousands the mechanism " +
        "concentrates; divergence means the utility regressed")
    assert(r.getAs[Double]("w_chosen") === 1.0)
  }
}
