package graft

import org.apache.spark.sql.functions._


/** Bucketed co-located join: pre-bucketing both sides on the join key lets
  * the join run with ZERO exchanges — the write-side layout investment
  * that pays on every subsequent join at 100 TB (SURVEY "co-locate joins
  * via bucketing"). */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    // spark.sql.warehouse.dir is static — bucketed tables land in the
    // default ./spark-warehouse (gitignored) and are dropped afterwards
    val li = Tables.lineitem(spark, Sf001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, Sf001).select("o_orderkey", "o_totalprice")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the join strategy actually depends on layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"),
        s"bucketed-on-key join must not shuffle either side:\n$p")
      assert(joined.count() === Tables.lineitem(spark, Sf001).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
