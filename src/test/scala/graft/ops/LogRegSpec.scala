package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-local Newton reference with plain double sums — the
    * independent ground truth (tolerance-compared: the op's decimal
    * accumulation differs from double sums only at last-ulp order). */
  private def naiveNewton(xs: Seq[Array[Double]], ys: Seq[Double],
      iters: Int, ridge: Double = 1e-9): Array[Double] = {
    val d = xs.head.length + 1
    var w = Array.fill(d)(0.0)
    def xi(x: Array[Double], i: Int) = if (i == 0) 1.0 else x(i - 1)
    for (_ <- 0 until iters) {
      val h = Array.ofDim[Double](d, d)
      val g = Array.fill(d)(0.0)
      for ((x, y) <- xs.zip(ys)) {
        val z = (1 until d).map(i => xi(x, i) * w(i)).sum + w(0)
        val p = 1.0 / (1.0 + math.exp(-z))
        for (i <- 0 until d; j <- 0 until d)
          h(i)(j) += xi(x, i) * xi(x, j) * p * (1 - p)
        for (i <- 0 until d) g(i) += xi(x, i) * (y - p)
      }
      for (i <- 0 until d) h(i)(i) += ridge
      // same elimination the op uses, via a tiny local copy
      val delta = solveLocal(h, g)
      w = Array.tabulate(d)(i => w(i) + delta(i))
    }
    w
  }

  private def solveLocal(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val d = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (k <- 0 until d) {
      var piv = k
      for (i <- k + 1 until d) if (math.abs(a(i)(k)) > math.abs(a(piv)(k))) piv = i
      val t = a(k); a(k) = a(piv); a(piv) = t
      val tb = b(k); b(k) = b(piv); b(piv) = tb
      for (i <- k + 1 until d) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until d) a(i)(j) -= f * a(k)(j)
        b(i) -= f * b(k)
      }
    }
    val x = new Array[Double](d)
    for (i <- d - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until d) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x
  }

  private def mkData(n: Int, seed: Int): (Seq[Array[Double]], Seq[Double]) = {
    val rnd = new scala.util.Random(seed)
    val xs = (1 to n).map(_ => Array(rnd.nextInt(30).toDouble, rnd.nextInt(10).toDouble))
    // true model: y likelier when x1 - x2 large (plus noise)
    val ys = xs.map(x =>
      if (1.0 / (1.0 + math.exp(-(0.3 * x(0) - 0.5 * x(1) - 2.0))) > rnd.nextDouble()) 1.0
      else 0.0)
    (xs, ys)
  }

  test("train matches a driver-local Newton reference") {
    val (xs, ys) = mkData(400, seed = 5)
    val df = xs.zip(ys).map { case (x, y) => (y, x(0), x(1)) }
      .toDF("y", "x1", "x2")
    val fit = LogReg.train(df, "y", Seq("x1", "x2"), iters = 3)
    val want = naiveNewton(xs, ys, iters = 3)
    for (i <- want.indices)
      assert(math.abs(fit.weights(i) - want(i)) < 1e-6,
        s"w($i): ${fit.weights(i)} vs ${want(i)}")
    assert(fit.losses.sliding(2).forall(p => p(1) <= p(0) + 1e-12),
      fit.losses.mkString(","))
    assert(fit.gradNorms.last < fit.gradNorms.head)
  }

  test("decimal accumulation makes the fit partition-layout invariant") {
    val (xs, ys) = mkData(300, seed = 9)
    val df = xs.zip(ys).map { case (x, y) => (y, x(0), x(1)) }
      .toDF("y", "x1", "x2")
    val w1 = LogReg.train(df.repartition(1), "y", Seq("x1", "x2"), iters = 3).weights
    val w32 = LogReg.train(df.repartition(32), "y", Seq("x1", "x2"), iters = 3).weights
    assert(w1.toSeq === w32.toSeq) // bit-identical, not approximately
  }

  test("saturated sigmoid keeps the loss finite over every row (no NULL drop)") {
    // huge unscaled feature drives p to exactly 1.0/0.0 within an
    // iteration — the regime where y·ln(p)+(1−y)·ln(1−p) NULLed rows
    val df = (0 until 100).map { i =>
      val x1 = if (i % 2 == 0) 5000.0 else -5000.0
      (if (x1 > 0) 1.0 else 0.0, x1)
    }.toDF("y", "x1")
    val fit = LogReg.train(df, "y", Seq("x1"), iters = 3)
    assert(fit.losses.forall(l => !l.isNaN && !l.isInfinite),
      fit.losses.mkString(","))
    // perfectly separable: the final loss must be (near) zero, which a
    // row-dropping aggregate would also fake — so ALSO check the first
    // loss is the full-corpus ln(2) sum, proving no row vanished
    assert(math.abs(fit.losses.head - 100 * math.log(2)) < 1e-9)
  }

  test("learns a separating direction on separable data") {
    // y = 1 iff x1 >= 5: weight on x1 must come out positive and the
    // model must classify the training set well after 4 iterations
    val df = (0 until 200).map { i =>
      val x1 = (i % 10).toDouble
      (if (x1 >= 5) 1.0 else 0.0, x1)
    }.toDF("y", "x1")
    val fit = LogReg.train(df, "y", Seq("x1"), iters = 4)
    assert(fit.weights(1) > 0, fit.weights.mkString(","))
    assert(fit.losses.last < 0.1 * fit.losses.head)
  }
}
