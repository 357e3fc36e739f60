package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed principal component analysis with exact sufficient
  * statistics — the embedding-space primitive a curation pipeline uses
  * for whitening, semantic-dedup preprocessing, and low-rank drift
  * monitoring.
  *
  * Scale shape: PCA over n rows × d dims needs exactly the d(d+1)/2
  * second moments and d first moments — everything else is driver-side
  * O(d³) on a d×d matrix (d is the embedding width, 64 here; nobody
  * distributes a 64×64 eigensolve, the same driver-boundary argument as
  * [[LogReg]]'s 4×4 Newton solve). The moments are computed RELATIONALLY:
  * posexplode to (id, i, x) postings, self-join on the row id (hash
  * partitioning on id keeps every pair computation co-located), one
  * map-side-combinable decimal sum per (i, j) cell — n·d² streamed rows,
  * never a d²-column aggregate (a 2080-buffer HashAggregate falls out of
  * codegen and compiles quadratically; 2080 GROUPS are free). Every sum
  * is DECIMAL(38,18)-exact, so the covariance matrix — and therefore the
  * eigensolve run on it — is bit-identical on any partition layout, and
  * a SQL engine can replay the matrix cell-for-cell.
  *
  * The eigensolve is a classic cyclic Jacobi: deterministic sweep order,
  * rotation only above a fixed absolute threshold, sign-canonicalized
  * eigenvectors (largest-magnitude component positive) — a pure function
  * of the exact covariance matrix.
  */
object Pca {

  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,18)")).cast("double")

  /** (id, i, x) postings, i 1-based (matching SQL list indexing). */
  def postings(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("__pid"), posexplode(col(vecCol)))
      .select(col("__pid"), (col("pos") + 1).cast("int").as("i"),
        col("col").cast("double").as("x"))

  /** Upper-triangle covariance cells (i ≤ j, 1-based): one row per cell
    * with the exact decimal second moment and the double covariance
    * (sxx − sxi·sxj/n)/(n−1) — the division sequence is the only IEEE
    * arithmetic and is replayed verbatim by the oracle.
    *
    * Contract: FIXED-WIDTH vectors with n ≥ 2 rows (ragged widths would
    * silently skew per-cell counts — NULL embeddings drop whole at the
    * posexplode; a single-row input divides by zero into ±Infinity
    * rather than throwing, as in any SQL engine). */
  def covariance(posts: DataFrame): DataFrame = {
    val second = posts.as("a")
      .join(posts.as("b"),
        col("a.__pid") === col("b.__pid") && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(decSum(col("a.x") * col("b.x")).as("sxx"))
    val firsts = posts.groupBy("i")
      .agg(decSum(col("x")).as("sx"), count(lit(1)).as("n"))
    second
      .join(broadcast(firsts.select(col("i"), col("sx").as("sx_i"),
        col("n"))), "i")
      .join(broadcast(firsts.select(col("i").as("j"),
        col("sx").as("sx_j"))), "j")
      .select(col("i"), col("j"),
        // try_divide: one vector (degen single corpus) has no sample
        // covariance — NULL cells (DuckDB's x/0), not an ANSI error
        org.apache.spark.sql.functions.try_divide(
          col("sxx") - col("sx_i") * col("sx_j") / col("n"),
          col("n") - 1).as("cov"))
  }

  final case class Eig(values: Array[Double], vectors: Array[Array[Double]])

  /** Cyclic Jacobi eigensolve of a symmetric matrix; returns eigenpairs
    * sorted by eigenvalue descending, each vector sign-canonicalized so
    * its largest-magnitude component is positive. Deterministic: fixed
    * (p, q) sweep order, fixed rotation threshold, fixed sweep cap. */
  def jacobi(m: Array[Array[Double]], maxSweeps: Int = 64): Eig = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until d; q <- p + 1 until d) s += a(p)(q) * a(p)(q)
      s
    }
    var sweep = 0
    while (off() > 1e-20 && sweep < maxSweeps) {
      for (p <- 0 until d; q <- p + 1 until d) {
        if (math.abs(a(p)(q)) > 1e-14) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // θ = 0 (equal diagonal) still needs the full 45° rotation:
          // signum(0) = 0 would silently make the rotation an identity
          val sgn = if (theta >= 0.0) 1.0 else -1.0
          val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    require(off() <= 1e-12,
      s"Jacobi did not converge in $maxSweeps sweeps (off=${off()})")
    val pairs = (0 until d).map { k =>
      val vec = Array.tabulate(d)(i => v(i)(k))
      val m0 = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      val sgn = if (vec(m0) < 0) -1.0 else 1.0
      (a(k)(k), vec.map(_ * sgn))
    }.sortBy(-_._1)
    Eig(pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** Per-row projection score onto a literal eigenvector: exact posting
    * join against a broadcast (component → weight) table, decimal-summed
    * per row — layout-independent, no HOF interpretation in the loop. */
  def projectionVariance(s: SparkSession, posts: DataFrame,
      vec: Array[Double]): Double = {
    import s.implicits._
    val w = vec.zipWithIndex
      .map { case (x, i) => (i + 1, x) }.toSeq.toDF("i", "w")
    val scores = posts.join(broadcast(w), "i")
      .groupBy("__pid")
      .agg(decSum(col("x") * col("w")).as("s"))
    val r = scores.agg(decSum(col("s")).as("ss"),
      decSum(col("s") * col("s")).as("s2"), count(lit(1)).as("n"))
      .collect()(0)
    val (ss, s2, n) = (r.getDouble(0), r.getDouble(1), r.getLong(2))
    (s2 - ss * ss / n) / (n - 1.0)
  }
}
