package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant checks for the session-7 statistics/mining queries — the
  * properties a correct implementation cannot violate regardless of data,
  * complementing the driver's cell-exact oracle gate. */
class Round7Spec extends SparkSpec {

  test("isotonic fit is non-decreasing and pools to the PAV solution") {
    val rows = EvalQueries.isotonic.run(spark, Sf001)
      .orderBy("bin").collect()
    val iso = rows.map(_.getAs[Double]("iso_rate")).toSeq
    assert(iso === iso.sorted, "PAV output must be non-decreasing")
    // driver-side reference: classic pool-adjacent-violators on the
    // same (n, n_pos) bins must agree with the minimax formula
    val blocks = rows.map(r =>
      (r.getAs[Long]("n_pos").toDouble, r.getAs[Long]("n").toDouble))
    var pooled = Vector.empty[(Double, Double)]
    for (b <- blocks) {
      pooled :+= b
      var merging = true
      while (merging && pooled.length >= 2) {
        val (p2, n2) = pooled.last
        val (p1, n1) = pooled(pooled.length - 2)
        if (p1 / n1 > p2 / n2)
          pooled = pooled.dropRight(2) :+ ((p1 + p2, n1 + n2))
        else merging = false
      }
    }
    // expand pooled blocks back over their member bins
    val refPerBin = {
      var out = Vector.empty[Double]
      var i = 0
      val ns = rows.map(_.getAs[Long]("n").toDouble)
      for ((p, n) <- pooled) {
        var acc = 0.0
        while (acc + 1e-9 < n && i < ns.length) {
          out :+= p / n
          acc += ns(i)
          i += 1
        }
      }
      out
    }
    assert(refPerBin.length === iso.length)
    refPerBin.zip(iso).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"PAV reference $a != minimax $b")
    }
  }

  test("sequence support: extending a pattern can never raise support") {
    val rows = EventQueries.seqSupport.run(spark, Sf001).collect()
    val sup = rows.map(r => r.getAs[String]("pattern") ->
      r.getAs[Long]("support")).toMap
    val threes = sup.keys.filter(_.count(_ == '>') == 2)
    assert(threes.nonEmpty, "expected some 3-patterns at sf0.001")
    threes.foreach { p =>
      val parts = p.split('>')
      val prefix = s"${parts(0)}>${parts(1)}"
      // prefix may have been filtered by the support floor only if the
      // 3-pattern was too — a present 3-pattern implies a present prefix
      assert(sup.contains(prefix), s"anti-monotonicity: $p without $prefix")
      assert(sup(prefix) >= sup(p),
        s"support($prefix)=${sup(prefix)} < support($p)=${sup(p)}")
    }
  }

  test("theil-sen slope shrugs off an outlier that wrecks the OLS slope") {
    import spark.implicits._
    // synthetic: y = 10x + noise-free, one wild outlier
    val pts = ((1 to 50).map(i => (i.toLong, 10.0 * i)) :+ (51L, 100000.0))
      .toDF("t", "v")
    val a = pts.select(col("t").as("t1"), col("v").as("v1"))
    val b = pts.select(col("t").as("t2"), col("v").as("v2"))
    val slope = a.join(b, col("t2") > col("t1"))
      .select(((col("v2") - col("v1")) / (col("t2") - col("t1")))
        .as("s"))
      .agg(median(col("s"))).head.getDouble(0)
    assert(math.abs(slope - 10.0) < 0.5, s"robust slope $slope should be ~10")
    val ols = pts.agg(
      (count(lit(1)) * sum(col("t") * col("v")) - sum("t") * sum("v")) /
        (count(lit(1)) * sum(col("t") * col("t")) - sum("t") * sum("t")))
      .head.getDouble(0)
    assert(math.abs(ols - 10.0) > 5.0, s"OLS $ols should be dragged far off")
  }

  test("PSI is non-negative and zero on identical distributions") {
    val rows = QualityQueries.psi.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getAs[Double]("psi_total")
    assert(total >= 0.0, s"PSI total $total must be >= 0")
    // each term (p-q)ln(p/q) is individually non-negative
    rows.foreach { r =>
      assert(r.getAs[Double]("psi_term") >= -1e-12,
        s"bin ${r.getAs[Long]("bin")} term negative")
    }
  }

  test("holt-winters seasonal slots stay finite and forecast is consistent") {
    val r = SeriesQueries.holtWinters.run(spark, Sf001).head()
    val level = r.getAs[Double]("level"); val trend = r.getAs[Double]("trend")
    val lastDay = r.getAs[Long]("last_day")
    val s = (0 to 6).map(i => r.getAs[Double](s"s$i"))
    assert(s.forall(v => !v.isNaN && !v.isInfinite))
    val expect = level + trend + s(((lastDay + 1) % 7).toInt)
    assert(math.abs(r.getAs[Double]("forecast") - expect) < 1e-9)
  }

  test("cramers V on independent columns is tiny; recall legs are sane") {
    val v = QualityQueries.cramersV.run(spark, Sf001).head()
    assert(v.getAs[Double]("cramers_v") >= 0.0)
    assert(v.getAs[Double]("cramers_v") < 0.2,
      "segment x priority are independent by construction")
    val rec = EvalQueries.recallAtK.run(spark, Sf001).collect()
    rec.foreach { r =>
      val recall = r.getAs[Double]("recall_10")
      val hits = r.getAs[Long]("hits_10")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(hits <= 10, "at most 10 hits in the top-10")
      assert(hits <= r.getAs[Long]("n_relevant"))
    }
  }
}
