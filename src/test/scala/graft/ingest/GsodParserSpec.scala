package graft.ingest

import graft.SparkSpec
import graft.ops.Windows
import org.apache.spark.sql.functions._

/** Parse/clean semantics of the reference's GSOD ETL, including the
  * documented divergences (SURVEY §2a F3/F4/F6, §7.3): flag stripping by
  * intent, per-row NULL on malformed dates, sentinel → NULL.
  */
class GsodParserSpec extends SparkSpec {

  lazy val obs = GsodParser.parse(spark, resource("gsod") + "/*.op").cache()

  test("header rows dropped, data rows parsed") {
    assert(obs.count() === 8) // 5 + 3 data rows, 2 headers dropped
  }

  test("F3: trailing '*' quality flag stripped from MAX/MIN") {
    val r = obs.filter(col("date") === "2019-01-01").head()
    assert(r.getAs[Double]("max") === 30.2)
    assert(r.getAs[Double]("min") === 19.0)
  }

  test("F4 intent: trailing A-I report flag stripped from PRCP, flagless values intact") {
    val flagged = obs.filter(col("date") === "2019-01-01").head()
    assert(flagged.getAs[Double]("prcp") === 0.05)
    // the reference's bug would corrupt flagless 0.25 -> 0.2 (untitled.py:54)
    val flagless = obs.filter(col("date") === "2019-01-10").head()
    assert(flagless.getAs[Double]("prcp") === 0.25)
  }

  test("P1: sentinels 9999.9/999.9/99.99 become NULL") {
    val r = obs.filter(col("usaf") === "725300" && col("day") === 3).head()
    assert(r.isNullAt(r.fieldIndex("temp")))
    assert(r.isNullAt(r.fieldIndex("wdsp")))
    assert(r.isNullAt(r.fieldIndex("max")))
    assert(r.isNullAt(r.fieldIndex("prcp")))
  }

  test("F6: malformed date parses to NULL per-row (not column-wide)") {
    assert(obs.filter(col("date").isNull).count() === 1)
    assert(obs.filter(col("date").isNotNull).count() === 7)
  }

  test("A1: monthly medians per station-month") {
    val m = GsodParser.monthlyMedians(obs.filter(col("date").isNotNull))
    assert(m.count() === 4) // 2 stations x 2 months
    val jan = m.filter(col("usaf") === "725300" && col("month") === 1).head()
    assert(jan.getAs[Double]("temp") === (25.1 + 28.4) / 2) // median of 2 (3rd is NULL)
  }

  test("W1: latest-per-station keeps the max-date rows") {
    val latest = Windows.latestPerKey(obs.filter(col("date").isNotNull),
      Seq("usaf", "wban"), "date")
    assert(latest.count() === 2)
    assert(latest.filter(col("usaf") === "725300").head().getAs[Int]("day") === 15)
  }

  test("station dimension: sentinel/null LAT filtered, coverage window applied") {
    val st = GsodParser.stations(spark, resource("gsod/isd-history.csv"), 2019, 2019)
    val keys = st.select("usaf").collect().map(_.getString(0)).toSet
    // DEAD STATION fails the END==2019 window; NULL ISLAND has null LAT;
    // SENTINEL POINT's 0.0 LAT is a sentinel -> filtered
    assert(keys === Set("725300", "725301"))
  }

  test("F1: null-skipping label concat (pandas str.cat semantics)") {
    val st = GsodParser.stations(spark, resource("gsod/isd-history.csv"), 2019, 2019)
    val lbl = st.filter(col("usaf") === "725301").head().getAs[String]("lbl")
    assert(lbl === "ROCKFORD GREATER, US<br>Elevation: 226.5 m") // null STATE skipped
  }

  test("end-to-end ETL: medians joined with station metadata") {
    val st = GsodParser.stations(spark, resource("gsod/isd-history.csv"), 2019, 2019)
    val out = GsodParser.etl(obs.filter(col("date").isNotNull), st)
    assert(out.count() === 4)
    assert(out.columns.contains("lbl") && out.columns.contains("temp"))
  }
}
