package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covariance matches the hand-computed matrix on a tiny dataset") {
    // three 2-d points: (1,2), (3,6), (5,4) — cov computed by hand:
    // mean (3,4); Sxx = [[4, 2], [2, 4]] (sample, n−1 = 2)
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)), (3L, Seq(5.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val posts = Pca.postings(emb, "vec_id", "embedding")
    val cells = Pca.covariance(posts)
      .select("i", "j", "cov").as[(Int, Int, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    assert(math.abs(cells((1, 1)) - 4.0) < 1e-12)
    assert(math.abs(cells((1, 2)) - 2.0) < 1e-12)
    assert(math.abs(cells((2, 2)) - 4.0) < 1e-12)
    assert(cells.size === 3) // upper triangle only
  }

  test("covariance is bit-identical across partition layouts") {
    val rnd = new scala.util.Random(7)
    val emb = (1 to 50).map { i =>
      (i.toLong, Seq.fill(6)(rnd.nextFloat() * 4 - 2))
    }.toDF("vec_id", "embedding")
    def cells(parts: Int) =
      Pca.covariance(Pca.postings(emb.repartition(parts), "vec_id",
          "embedding"))
        .select("i", "j", "cov").as[(Int, Int, Double)].collect()
        .sortBy(c => (c._1, c._2)).toSeq
    // exact decimal sums: not approximately equal — EQUAL
    assert(cells(1) === cells(13))
  }

  test("jacobi solves a known 2×2 exactly and orders eigenvalues descending") {
    val eig = Pca.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(eig.values(0) - 3.0) < 1e-12)
    assert(math.abs(eig.values(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(eig.vectors(0).zip(Array(s, s)).forall {
      case (a, b) => math.abs(a - b) < 1e-12
    })
  }

  test("jacobi reconstructs random symmetric matrices: A = V diag(λ) Vᵀ") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val d = 5 + trial * 3
      val b = Array.fill(d, d)(rnd.nextDouble() * 2 - 1)
      // A = BᵀB: symmetric PSD with distinct-enough spectrum
      val a = Array.tabulate(d, d)((i, j) =>
        (0 until d).map(k => b(k)(i) * b(k)(j)).sum)
      val eig = Pca.jacobi(a)
      for (i <- 0 until d; j <- 0 until d) {
        val recon = (0 until d)
          .map(k => eig.vectors(k)(i) * eig.values(k) * eig.vectors(k)(j)).sum
        assert(math.abs(recon - a(i)(j)) < 1e-9, s"trial $trial ($i,$j)")
      }
      // orthonormal basis
      for (k <- 0 until d; l <- k until d) {
        val dot = (0 until d).map(i => eig.vectors(k)(i) * eig.vectors(l)(i)).sum
        assert(math.abs(dot - (if (k == l) 1.0 else 0.0)) < 1e-10)
      }
      assert(eig.values.toSeq.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    }
  }

  test("projection variance onto an eigenvector equals its eigenvalue") {
    val rnd = new scala.util.Random(19)
    val emb = (1 to 120).map { i =>
      // anisotropic cloud: x ~ 3·N, y ~ N, correlated
      val u = rnd.nextGaussian(); val v = rnd.nextGaussian()
      (i.toLong, Seq((3 * u).toFloat, (u + 0.5 * v).toFloat,
        (0.25 * v).toFloat))
    }.toDF("vec_id", "embedding")
    val posts = Pca.postings(emb, "vec_id", "embedding").cache()
    val cells = Pca.covariance(posts)
      .select("i", "j", "cov").as[(Int, Int, Double)].collect()
    val m = Array.ofDim[Double](3, 3)
    cells.foreach { case (i, j, c) => m(i - 1)(j - 1) = c; m(j - 1)(i - 1) = c }
    val eig = Pca.jacobi(m)
    for (k <- 0 until 3) {
      val got = Pca.projectionVariance(spark, posts, eig.vectors(k))
      assert(math.abs(got - eig.values(k)) <= 1e-9 * math.max(1.0, eig.values(0)),
        s"component $k: var $got vs λ ${eig.values(k)}")
    }
  }
}
