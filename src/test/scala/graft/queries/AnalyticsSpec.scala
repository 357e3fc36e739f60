package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("approx median is within 1 quantity unit of the exact median per group") {
    // The tolerance check now lives IN the query (approx_ok, oracled as
    // constant-true by the driver); this asserts the same verdict plus
    // that the embedded exact median agrees with q_groupby_median's.
    val rows = AnalyticsQueries.medianApprox.run(spark, Sf001)
    assert(rows.count() === 6)
    assert(rows.filter(col("approx_ok") =!= 1).count() === 0)
    val exact = RelationalQueries.groupbyMedian.run(spark, Sf001)
      .select("l_returnflag", "l_linestatus", "med_qty")
    val joined = exact.join(rows, Seq("l_returnflag", "l_linestatus"))
    assert(joined.filter(col("med_qty") =!= col("med_exact")).count() === 0)
  }

  test("count-min heavy hitters: both sketch verdicts hold on every top token") {
    val rows = AnalyticsQueries.heavyHitters.run(spark, Sf001).collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getAs[Int]("never_under") === 1),
      "a Count-Min sketch can never underestimate")
    assert(rows.forall(_.getAs[Int]("within_eps") === 1),
      "seeded overestimate must stay within 2*eps*N")
    // exact counts descend (ties broken by token)
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts === cnts.sorted.reverse)
  }

  test("rollup emits group, subtotal, and grand-total levels consistently") {
    val r = AnalyticsQueries.rollup.run(spark, Sf001).collect()
    val grand = r.filter(x => x.getString(0) == "ALL" && x.getString(1) == "ALL")
    assert(grand.length === 1)
    val leafSum = r.filter(x => x.getString(0) != "ALL" && x.getString(1) != "ALL")
      .map(_.getLong(2)).sum
    assert(grand.head.getLong(2) === leafSum)
  }

  test("approx distinct (HLL++, rsd 2%) lands within 5% of the exact count") {
    val joined = graft.Tables.events(spark, Sf001)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("n_users_approx"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("relerr",
        abs(col("n_users_approx") - col("n_users")).cast("double") / col("n_users"))
    assert(joined.count() === 5)
    assert(joined.filter(col("relerr") > 0.05).count() === 0)
    // The registered query's verdict column must agree (10% tolerance)
    val q = ExtendedQueries.approxDistinct.run(spark, Sf001)
    assert(q.filter(col("approx_ok") =!= 1).count() === 0)
  }

  test("grouping sets levels are internally consistent (leaves re-sum to total)") {
    val r = ExtendedQueries.groupingSets.run(spark, Sf001).collect()
    val grand = r.filter(x => x.getInt(2) == 1 && x.getInt(3) == 1)
    assert(grand.length === 1)
    val leaves = r.filter(x => x.getInt(2) == 0 && x.getInt(3) == 0)
    assert(leaves.map(_.getLong(4)).sum === grand.head.getLong(4))
  }

  test("pivot row counts re-sum to the event total") {
    val p = AnalyticsQueries.pivot.run(spark, Sf001)
    val total = p.select(
      (Seq("click", "view", "purchase", "signup", "error")
        .map(c => sum(col(c))).reduce(_ + _)).as("t")).head().getLong(0)
    assert(total === graft.Tables.events(spark, Sf001).count())
  }

  test("bloom sketch: no false negatives on built keys, low FP on foreign keys") {
    import graft.functions.BloomSketch._
    val keys = spark.range(0, 1000).toDF("k").repartition(4) // distributed build
    val bf = keys.agg(bloom_filter_agg(xxhash64(col("k")), 1000L, 10000L).as("b"))
      .head().getAs[Array[Byte]](0)
    val members = spark.range(0, 1000).toDF("k")
      .filter(!bloom_might_contain(lit(bf), xxhash64(col("k"))))
    assert(members.count() === 0, "a Bloom filter must never miss a built key")
    val foreign = spark.range(5000, 6000).toDF("k")
      .filter(bloom_might_contain(lit(bf), xxhash64(col("k"))))
    assert(foreign.count() <= 100, "false-positive rate should stay low at 10 bits/key")
  }

  test("item CF: similarity recomputes from counts; per-item ranking is proper") {
    val rows = AnalyticsQueries.itemCf.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val b = graft.Tables.lineitem(spark, Sf001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val support = b.groupBy("pk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[Long]("item")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks === (1 to ranks.length), "ranks are 1..k without holes")
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("ochiai"))
      assert(scores.toSeq === scores.sortBy(-_).toSeq, "ochiai non-increasing")
    }
    rows.foreach { r =>
      val want = r.getAs[Long]("c").toDouble /
        math.sqrt((support(r.getAs[Long]("item")) *
          support(r.getAs[Long]("other"))).toDouble)
      assert(r.getAs[Double]("ochiai") === want)
      assert(r.getAs[Double]("ochiai") <= 1.0 + 1e-15)
    }
  }

  test("journey patterns: top triple's support recounts from first occurrences") {
    val rows = EventQueries.journeyPatterns.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c) = (r.getString(0), r.getString(1), r.getString(2))
      assert(a != b && b != c && a != c,
        "first-occurrence ordering is strict, so types in a triple are distinct")
      assert(r.getAs[Long]("support") >= 5L)
    }
    val h = rows.head
    import spark.implicits._
    val firsts = graft.Tables.events(spark, Sf001)
      .groupBy("user_id", "event_type")
      .agg(min(struct(col("ts"), col("event_id"))).as("ft"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getStruct(2).getTimestamp(0).getTime, r.getStruct(2).getLong(1)))
      .toMap
    val users = firsts.keys.map(_._1).toSet
    val want = users.count { u =>
      (firsts.get((u, h.getString(0))), firsts.get((u, h.getString(1))),
        firsts.get((u, h.getString(2)))) match {
        case (Some(x), Some(y), Some(z)) =>
          Ordering[(Long, Long)].lt(x, y) && Ordering[(Long, Long)].lt(y, z)
        case _ => false
      }
    }
    assert(h.getAs[Long]("support") === want.toLong)
  }

  test("itemsets: association metrics are internally consistent and pairs canonical") {
    val rows = AnalyticsQueries.itemsets.run(spark, Sf001).collect()
    assert(rows.length === 100)
    val nBaskets = graft.Tables.lineitem(spark, Sf001)
      .select("l_orderkey").distinct().count()
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(a < b, "pairs must be canonical a < b")
      val (nAb, nA, nB) =
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(nAb >= 2 && nAb <= math.min(nA, nB))
      assert(r.getAs[Double]("conf_ab") === nAb.toDouble / nA)
      // lift = conf(a->b) / P(b); single-division forms must agree exactly
      // up to the one extra rounding step of the composed form
      val lift = r.getAs[Double]("lift")
      assert(math.abs(lift - nAb.toDouble * nBaskets / (nA.toDouble * nB)) < 1e-12)
      assert(lift > 1.0, "top-100 by lift on sparse baskets must be positive assoc")
    }
    // spot-check one pair's support by recount
    val h = rows.head
    val b = graft.Tables.lineitem(spark, Sf001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val n = b.filter(col("pk") === h.getAs[Long]("a"))
      .join(b.filter(col("pk") === h.getAs[Long]("b"))
        .select(col("ok")), "ok")
      .count()
    assert(n === h.getAs[Long]("n_ab"))
  }
}
