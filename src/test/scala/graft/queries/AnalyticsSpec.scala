package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("approx median is within 1 quantity unit of the exact median per group") {
    val exact = RelationalQueries.groupbyMedian.run(spark, Sf001)
      .select("l_returnflag", "l_linestatus", "med_qty")
    val approx = AnalyticsQueries.medianApprox.run(spark, Sf001)
      .select("l_returnflag", "l_linestatus", "approx_med_qty")
    val joined = exact.join(approx, Seq("l_returnflag", "l_linestatus"))
      .withColumn("err", abs(col("med_qty") - col("approx_med_qty")))
    assert(joined.count() === 6)
    assert(joined.filter(col("err") > 1.0).count() === 0)
  }

  test("rollup emits group, subtotal, and grand-total levels consistently") {
    val r = AnalyticsQueries.rollup.run(spark, Sf001).collect()
    val grand = r.filter(x => x.getString(0) == "ALL" && x.getString(1) == "ALL")
    assert(grand.length === 1)
    val leafSum = r.filter(x => x.getString(0) != "ALL" && x.getString(1) != "ALL")
      .map(_.getLong(2)).sum
    assert(grand.head.getLong(2) === leafSum)
  }

  test("pivot row counts re-sum to the event total") {
    val p = AnalyticsQueries.pivot.run(spark, Sf001)
    val total = p.select(
      (Seq("click", "view", "purchase", "signup", "error")
        .map(c => sum(col(c))).reduce(_ + _)).as("t")).head().getLong(0)
    assert(total === graft.Tables.events(spark, Sf001).count())
  }
}
