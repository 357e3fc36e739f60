package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("scoreTable reproduces hand-computed smoothed scores on a toy table") {
    // 6 rows, one feature with values a/b, labels chosen so counts are easy:
    // pos: (a,1) x2, (b,1) x1; neg: (a,0) x1, (b,0) x2
    val df = Seq(("a", 1), ("a", 1), ("b", 1), ("a", 0), ("b", 0), ("b", 0))
      .toDF("f", "y")
    val got = NaiveBayes.scoreTable(df, Seq("f"), "y")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("p_pos"),
          r.getAs[Double]("p_neg"), r.getAs[Int]("pred")))).toMap
    // npos=3, n=6, V=2; P(a|+)=(2+1)/(3+2)=0.6, P(a|-)=(1+1)/(3+2)=0.4
    val pPosA = 3.0 / 6.0 * (3.0 / 5.0)
    val pNegA = 3.0 / 6.0 * (2.0 / 5.0)
    assert(got("a") === ((3L, pPosA, pNegA, 1)))
    val pPosB = 3.0 / 6.0 * (2.0 / 5.0)
    val pNegB = 3.0 / 6.0 * (3.0 / 5.0)
    assert(got("b") === ((3L, pPosB, pNegB, 0)))
  }

  test("smoothing: a value never seen with a class still scores nonzero") {
    // value "c" appears only with label 0 — unsmoothed P(c|+) would be 0
    val df = Seq(("a", 1), ("a", 1), ("c", 0)).toDF("f", "y")
    val got = NaiveBayes.scoreTable(df, Seq("f"), "y")
      .filter(col("f") === "c").head()
    assert(got.getAs[Double]("p_pos") > 0.0)
    assert(got.getAs[Int]("pred") === 0, "but the seen class still wins")
  }

  test("two features multiply conditionals; combo rows partition the input") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 200).map { _ =>
      val f1 = "s" + rnd.nextInt(3)
      val f2 = rnd.nextInt(2)
      // correlated label so predictions are non-constant
      val y = if (rnd.nextDouble() < (if (f1 == "s0") 0.8 else 0.2)) 1 else 0
      (f1, f2, y)
    }
    val df = rows.toDF("f1", "f2", "y")
    val got = NaiveBayes.scoreTable(df, Seq("f1", "f2"), "y").collect()
    assert(got.map(_.getAs[Long]("n_rows")).sum === 200L)
    // replicate one combo by hand
    val h = got.head
    val (f1v, f2v) = (h.getString(0), h.getInt(1))
    val npos = rows.count(_._3 == 1).toDouble
    val n = rows.size.toDouble
    val p1 = rows.count(r => r._1 == f1v && r._3 == 1)
    val c1 = rows.count(_._1 == f1v)
    val v1 = rows.map(_._1).distinct.size
    val p2 = rows.count(r => r._2 == f2v && r._3 == 1)
    val c2 = rows.count(_._2 == f2v)
    val v2 = rows.map(_._2).distinct.size
    val want = npos / n * ((p1 + 1) / (npos + v1)) * ((p2 + 1) / (npos + v2))
    assert(math.abs(h.getAs[Double]("p_pos") - want) < 1e-15)
    val wantN = (n - npos) / n * ((c1 - p1 + 1) / (n - npos + v1)) *
      ((c2 - p2 + 1) / (n - npos + v2))
    assert(math.abs(h.getAs[Double]("p_neg") - wantN) < 1e-15)
    // the engineered signal must actually separate: s0 combos predict 1
    got.filter(_.getString(0) == "s0").foreach(r =>
      assert(r.getAs[Int]("pred") === 1))
  }
}
