package graft.functions

import graft.SparkSpec

/** The custom expressions reachable through the SQL surface. */
class SqlFunctionsSpec extends SparkSpec {

  test("cosine_sim / rolling_hash / simhash64 callable from spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS cos,
             rolling_hash('abc') AS rh,
             simhash64(array('a', 'b')) AS sh
    """).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) === 96354L)
    assert(r.getLong(2) !== 0L)
  }

  test("wrong arity fails analysis with a named error") {
    GraftFunctions.registerAll(spark)
    val e = intercept[Exception](spark.sql("SELECT cosine_sim(array(1.0d))").head())
    assert(e.getMessage.contains("cosine_sim"))
  }
}
