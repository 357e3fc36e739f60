package graft.queries

import graft.SparkSpec

/** Invariants for the seventh session-8 batch. */
class Round7eSpec extends SparkSpec {

  test("ridge at lambda=0 reproduces the OLS fit; slopes shrink with lambda") {
    val path = SeriesQueries.ridgePath.run(spark, Sf001).collect()
      .sortBy(_.getAs[Double]("lambda"))
    assert(path.length === 3)
    val ols = SeriesQueries.linregMulti.run(spark, Sf001).head()
    assert(math.abs(path.head.getAs[Double]("b1") -
      ols.getAs[Double]("b1")) < 1e-4)
    assert(math.abs(path.head.getAs[Double]("b2") -
      ols.getAs[Double]("b2")) < 1e-4)
    val b2s = path.map(r => math.abs(r.getAs[Double]("b2")))
    assert(b2s(0) >= b2s(1) && b2s(1) >= b2s(2),
      "|b2| must shrink monotonically along the path")
  }

  test("wilcoxon: W2+ bounded by the doubled total rank sum") {
    val r = QualityQueries.wilcoxon.run(spark, Sf001).head()
    val n = r.getAs[Long]("n_pairs")
    // Σ 2·avgrank over ALL pairs = n(n+1); W2+ is the positive part
    assert(r.getAs[Long]("w2_plus") >= 0 &&
      r.getAs[Long]("w2_plus") <= n * (n + 1))
  }

  test("mcnemar: discordant cells bounded by customer count") {
    val r = QualityQueries.mcnemar.run(spark, Sf001).head()
    assert(r.getAs[Long]("only_1994") + r.getAs[Long]("only_1995") <=
      r.getAs[Long]("n_customers"))
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("l-diversity: modal share within [1/l, 1]; groups cover customers") {
    val rows = QualityQueries.lDiversity.run(spark, Sf001).collect()
    val total = rows.map(_.getAs[Long]("group_n")).sum
    assert(total === graft.Tables.customer(spark, Sf001).count())
    rows.foreach { r =>
      val l = r.getAs[Long]("l_distinct")
      val share = r.getAs[Double]("modal_share")
      assert(l >= 1)
      // share ships rounded at 1e-6, so it can sit half an ulp-of-round
      // under the exact 1/l bound
      assert(share >= 1.0 / l.toDouble - 5e-7 && share <= 1.0)
      assert(r.getAs[Long]("modal_n") <= r.getAs[Long]("group_n"))
    }
  }
}
