package graft.functions

import graft.SparkSpec
import graft.functions.CosineSim.cosine_sim
import graft.functions.RollingHash.rolling_hash
import graft.functions.SimHash64.simhash64
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("RollingHash: known value, matches the documented recurrence") {
    // h("abc") = ((0*31+97)*31+98)*31+99 mod 1e9+7 = 96354
    val h = Seq("abc").toDF("s").select(rolling_hash(col("s"))).head().getLong(0)
    assert(h === 96354L)
  }

  test("RollingHash: empty string hashes to 0, null propagates") {
    val df = Seq(Some(""), None).toDF("s").select(rolling_hash(col("s")).as("h"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === 0L)
    assert(rows(1).isNullAt(0))
  }

  test("CosineSim: identical -> 1, orthogonal -> 0, zero-norm -> null") {
    val df = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0)),
      (Array(1.0, 0.0), Array(0.0, 5.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0)))
      .toDF("a", "b")
      .select(cosine_sim(col("a"), col("b")).as("cos"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).getDouble(0) === 0.0)
    assert(rows(2).isNullAt(0))
  }

  test("CosineSim survives codegen and interpreted paths identically") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val expected = (4 + 10 + 18) / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(df.select(cosine_sim(col("a"), col("b"))).head().getDouble(0)
      - expected) < 1e-12)
  }

  test("SimHash64: deterministic, equal inputs collide, near inputs are hamming-close") {
    val toks = (1 to 50).map(i => s"tok$i")
    val near = toks.updated(10, "CHANGED")
    val far = (1 to 50).map(i => s"other$i")
    val df = Seq(toks, toks, near, far).toDF("t").select(simhash64(col("t")).as("h"))
    val Array(a, b, c, d) = df.collect().map(_.getLong(0))
    assert(a === b)
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(a, c) < hamming(a, d),
      s"near doc (${hamming(a, c)} bits) should be closer than unrelated (${hamming(a, d)} bits)")
    assert(hamming(a, c) <= 16)
  }

  test("SimHash64: empty token array -> 0") {
    val h = Seq(Seq.empty[String]).toDF("t").select(simhash64(col("t"))).head().getLong(0)
    assert(h === 0L)
  }

  test("NearestCentroid: argmin by squared L2, ties to lowest index, null propagates") {
    import graft.functions.NearestCentroid.nearest_centroid
    val cs = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0))
    val df = Seq(
      Some(Array(1.0, 1.0)),   // nearest origin -> 0
      Some(Array(9.0, 1.0)),   // nearest (10,0) -> 1
      Some(Array(1.0, 9.0)),   // nearest (0,10) -> 2
      Some(Array(5.0, 0.0)),   // equidistant from 0 and 1 -> tie to 0
      None)
      .toDF("v")
      .select(nearest_centroid(col("v"), cs).as("c"))
    val rows = df.collect()
    assert(rows.take(4).map(_.getInt(0)).toSeq === Seq(0, 1, 2, 0))
    assert(rows(4).isNullAt(0))
  }

  test("NearestCentroid: codegen'd plan agrees with the driver-local kernel per row") {
    import graft.functions.NearestCentroid.nearest_centroid
    val rnd = new scala.util.Random(7)
    val cs = Array.fill(5)(Array.fill(8)(rnd.nextGaussian()))
    val vecs = Seq.fill(100)(Array.fill(8)(rnd.nextGaussian()))
    val got = vecs.toDF("v")
      .select(nearest_centroid(col("v"), cs).as("c"))
      .collect().map(_.getInt(0)).toSeq
    val want = vecs.map(v => NearestCentroid.compute(v, cs))
    assert(got === want)
  }
}
