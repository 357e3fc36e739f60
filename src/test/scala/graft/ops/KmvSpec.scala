package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  /** Driver-local twin of Kmv.hash48 — md5 hex, first 12 digits, base 16. */
  private def h48(key: String, salt: String = "kmv42:"): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + key).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }

  private def localEst(hashes: Seq[Long], k: Int): Long = {
    val n = hashes.size.toLong
    if (n < k) n
    else ((k - 1).toLong * Kmv.HashDomain) / (hashes.sorted.apply(k - 1) + 1)
  }

  test("hash48 matches the driver-local md5 twin") {
    val ids = (1L to 40L).toDF("id")
    val got = ids.select(col("id"), Kmv.hash48(col("id")).as("h"))
      .as[(Long, Long)].collect().toMap
    (1L to 40L).foreach { id =>
      assert(got(id) === h48(id.toString), s"id=$id")
    }
  }

  test("sketch-complete branch: estimate equals the exact count when n < k") {
    val ids = (1L to (K - 3).toLong).toDF("id")
      .withColumn("h", Kmv.hash48(col("id")))
    val sk = Kmv.sketchCols(K, col("h"))
    val row = ids.agg(sk.head, sk.tail: _*)
      .withColumn("est", Kmv.estimate(K, "hs", "n"))
      .select("n", "est").as[(Long, Long)].head()
    assert(row === ((K - 3).toLong, (K - 3).toLong))
  }

  test("estimator branch matches the local KMV formula and is layout-independent") {
    val n = 500
    val localHs = (1 to n).map(i => h48(i.toString))
    val expected = localEst(localHs, K)
    // sanity: the estimator should actually estimate (within 3x here; the
    // REAL guarantee under test is exact replay, not accuracy)
    assert(expected > n / 3 && expected < n * 3)
    for (parts <- Seq(1, 7)) {
      val ids = (1 to n).map(_.toLong).toDF("id").repartition(parts)
        .withColumn("h", Kmv.hash48(col("id")))
      val sk = Kmv.sketchCols(K, col("h"))
      val est = ids.agg(sk.head, sk.tail: _*)
        .withColumn("est", Kmv.estimate(K, "hs", "n"))
        .select("est").as[Long].head()
      assert(est === expected, s"parts=$parts")
    }
  }

  test("sketch array is the k smallest hashes ascending — merge = top-k of concat") {
    val aIds = (1 to 120).map(i => s"a$i")
    val bIds = (80 to 200).map(i => s"b$i")
    val df = (aIds ++ bIds).toDF("id")
      .withColumn("h", Kmv.hash48(col("id")))
    val sk = Kmv.sketchCols(K, col("h"))
    val hs = df.agg(sk.head, sk.tail: _*)
      .select("hs").as[Seq[Long]].head()
    val expect = (aIds ++ bIds).map(h48(_)).sorted.take(K)
    assert(hs === expect)
  }

  test("intersection estimate: rho over the union sketch tracks true overlap") {
    // A = 1..300, B = 200..500 → |A∩B| = 101, |A∪B| = 500
    val a = (1 to 300).map(_.toString)
    val b = (200 to 500).map(_.toString)
    val k = 64
    val skA = a.map(h48(_)).sorted.take(k).toSet
    val skB = b.map(h48(_)).sorted.take(k).toSet
    val uni = (a ++ b).distinct
    val skU = uni.map(h48(_)).sorted.take(k)
    val rho = skU.count(h => skA.contains(h) && skB.contains(h))
    val estU = localEst(uni.map(h48(_)), k)
    val estI = rho.toLong * estU / k
    // KMV intersection guarantee is statistical; with k=64 on 500 keys the
    // estimate must land in the right ballpark of the true 101
    assert(estI > 30 && estI < 300, s"estI=$estI")
  }
}
