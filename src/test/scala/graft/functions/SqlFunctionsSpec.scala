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

  test("jaro_winkler / z_value callable from spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw,
             z_value(3L, 5L) AS z
    """).head()
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
    // interleave(3=0b011, 5=0b101): bits y=5 even positions, x=3 odd
    assert(r.getLong(1) === ZValue.compute(3L, 5L))
  }
}
