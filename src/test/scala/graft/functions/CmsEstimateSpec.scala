package graft.functions

import graft.SparkSpec
import graft.functions.CmsEstimate.cms_estimate
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** The in-plan CMS probe must agree with the hashing of the sketch the
  * builtin count_min_sketch AGGREGATE built — estimates against a sketch
  * hashed differently are garbage that still looks like numbers, so the
  * exactness case (wide sketch, few items → zero collisions) is the
  * load-bearing test, not just the ≥-truth inequality. */
class CmsEstimateSpec extends SparkSpec {
  import spark.implicits._

  test("long keys: exact on a collision-free sketch, never under truth") {
    val df = (1L to 50L).flatMap(k => Seq.fill(k.toInt % 5 + 1)(k)).toDF("k")
    val sk = df.agg(expr("count_min_sketch(k, 0.0001d, 0.999d, 7)").as("sk"))
    val truth = df.groupBy("k").agg(count(lit(1)).as("cnt"))
    val got = truth.crossJoin(broadcast(sk))
      .select(col("k"), col("cnt"), cms_estimate(col("sk"), col("k")).as("est"))
      .collect()
    assert(got.length === 50)
    // eps=1e-4 → ~27k counters for 50 items: collisions ~impossible, so
    // a hash mismatch between agg and probe shows up as inequality here
    got.foreach(r => assert(r.getLong(2) === r.getLong(1),
      s"key ${r.getLong(0)}: est ${r.getLong(2)} != true ${r.getLong(1)}"))
  }

  test("string keys hash like the aggregate's UTF-8-bytes update path") {
    val df = Seq("alpha", "beta", "beta", "gamma", "gamma", "gamma").toDF("s")
    val sk = df.agg(expr("count_min_sketch(s, 0.0001d, 0.999d, 7)").as("sk"))
    val got = Seq("alpha", "beta", "gamma", "absent").toDF("s")
      .crossJoin(broadcast(sk))
      .select(col("s"), cms_estimate(col("sk"), col("s")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("alpha" -> 1L, "beta" -> 2L, "gamma" -> 3L,
      "absent" -> 0L))
  }

  test("absent long key estimates 0 on a sparse sketch; null propagates") {
    val df = Seq(1L, 2L).toDF("k")
    val sk = df.agg(expr("count_min_sketch(k, 0.0001d, 0.999d, 7)").as("sk"))
    val got = Seq(Some(99L), None).toDF("k").crossJoin(broadcast(sk))
      .select(cms_estimate(col("sk"), col("k")).as("est")).collect()
    assert(got(0).getLong(0) === 0L)
    assert(got(1).isNullAt(0))
  }

  test("callable from spark.sql; wrong probe type fails analysis") {
    GraftFunctions.registerAll(spark)
    val est = spark.sql("""
      WITH d AS (SELECT * FROM VALUES (1L), (1L), (2L) AS t(k)),
      sk AS (SELECT count_min_sketch(k, 0.0001d, 0.999d, 7) AS s FROM d)
      SELECT cms_estimate(s, 1L) AS e FROM sk
    """).head().getLong(0)
    assert(est === 2L)
    val ex = intercept[AnalysisException] {
      spark.sql("""
        WITH sk AS (SELECT count_min_sketch(1L, 0.0001d, 0.999d, 7) AS s
                    FROM VALUES (1))
        SELECT cms_estimate(s, 1.5d) FROM sk
      """).collect()
    }
    assert(ex.getMessage.contains("integral or string"))
  }
}
