package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    // (group, key, id) — group "a" has ties on key handled by id asc
    ("a", 10L, 1L), ("a", 10L, 2L), ("a", 9L, 3L), ("a", 8L, 4L),
    ("b", 5L, 10L), ("b", 7L, 11L),
    ("c", 1L, 20L))
    .toDF("g", "key", "id")

  test("aggregator top-k equals the window row_number form") {
    val top2 = TopK.topK(2)
    // fold the id tie-break into the key exactly like the query does
    val composite = col("key") * 1000L + (lit(999L) - col("id"))
    val got = sample.repartition(4)
      .groupBy("g")
      .agg(top2(composite, col("id")).as("ids"))
      .select(col("g"), concat_ws(",", col("ids").cast("array<string>")).as("ids"))
      .orderBy("g").as[(String, String)].collect().toSeq

    val w = Window.partitionBy("g").orderBy(col("key").desc, col("id").asc)
    val want = sample
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .groupBy("g")
      .agg(concat_ws(",", sort_array(collect_list(struct(col("rn"), col("id"))))
        .getField("id").cast("array<string>")).as("ids"))
      .orderBy("g").as[(String, String)].collect().toSeq

    assert(got === want)
    assert(got === Seq(("a", "1,2"), ("b", "11,10"), ("c", "20")))
  }

  test("top-k kernel: reduce/merge keep only k, ordered desc with id tiebreak") {
    val agg = new TopKByKey(3)
    val buf = Seq(5L -> 1L, 1L -> 2L, 9L -> 3L, 9L -> 0L, 2L -> 4L)
      .map { case (k, i) => KeyedId(k, i) }
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.map(_.id) === Seq(0L, 3L, 1L)) // 9-id0, 9-id3, 5-id1
    val merged = agg.merge(buf, Seq(KeyedId(7L, 9L)))
    assert(agg.finish(merged) === Seq(0L, 3L, 9L))
  }

  test("Long.MinValue keys rank last, not first (no negation overflow)") {
    val agg = new TopKByKey(2)
    val buf = Seq(KeyedId(Long.MinValue, 1L), KeyedId(5L, 2L), KeyedId(9L, 3L))
      .foldLeft(agg.zero)(agg.reduce)
    // −Long.MinValue overflows to itself; a negating ordering would rank
    // the smallest key as the LARGEST and return id 1 here
    assert(agg.finish(buf) === Seq(3L, 2L))
  }

  test("aggregation is partial (ObjectHashAggregate map-side combine in plan)") {
    val top2 = TopK.topK(2)
    val df = sample.repartition(4).groupBy("g").agg(top2(col("key"), col("id")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_topkbykey"), plan)
  }
}
