package graft.queries

import graft.SparkSpec

/** Invariants for the session-8 closing pair. */
class Round7fSpec extends SparkSpec {

  test("ess: bounded by the group size, ratio in (0, 1]") {
    val rows = PipelineQueries.essAudit.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val ess = r.getAs[Double]("ess")
      assert(ess > 0.0 && ess <= n.toDouble + 1e-6,
        s"ESS $ess out of (0, $n]")
      val ratio = r.getAs[Double]("ess_ratio")
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-9)
    }
  }

  test("seasonal MK: |S| bounded by the within-season pair count") {
    val r = SeriesQueries.seasonalMk.run(spark, Sf001).head()
    val n = r.getAs[Long]("n_days")
    // 7 seasons of ~n/7 days each: Σ nₛ(nₛ−1)/2 pairs is the hard bound
    val maxPairs = {
      val per = n / 7; 7 * per * (per + 1) / 2
    }
    assert(math.abs(r.getAs[Long]("mk_s")) <= maxPairs)
  }
}
