package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.toDF("event_id", "ts", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts")))

  test("dailyStreaks: islands split on gaps, runs count consecutive days") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "u1", 1.0),
      (2L, "2024-01-02 10:00:00", "u1", 1.0),
      (3L, "2024-01-02 15:00:00", "u1", 1.0), // same day, no double count
      (4L, "2024-01-05 10:00:00", "u1", 1.0),
      (5L, "2024-01-03 10:00:00", "u2", 1.0))
    val r = Series.dailyStreaks(e, "user_id", "ts")
      .orderBy("user_id")
      .as[(String, Long, Long, Long)].collect()
    assert(r(0) === (("u1", 3L, 2L, 2L))) // 3 active days, 2 streaks, longest 2
    assert(r(1) === (("u2", 1L, 1L, 1L)))
  }

  test("transitions: adjacency follows (ts, tiebreak) order; P sums to 1 per from") {
    val e = Seq(
      (1L, "2024-01-01 10:00:00", "u1", "view"),
      (2L, "2024-01-01 11:00:00", "u1", "click"),
      (3L, "2024-01-01 12:00:00", "u1", "view"),
      (4L, "2024-01-01 10:30:00", "u2", "view"),
      (5L, "2024-01-01 10:45:00", "u2", "buy"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
    val t = Series.transitions(e, "user_id", "ts", "event_type", "event_id")
    val rows = t.orderBy("from_type", "to_type")
      .select("from_type", "to_type", "cnt")
      .as[(String, String, Long)].collect().toSeq
    assert(rows === Seq(("click", "view", 1L), ("view", "buy", 1L),
      ("view", "click", 1L)))
    val sums = t.groupBy("from_type").agg(sum("p_cond").as("p"))
      .select("p").as[Double].collect()
    sums.foreach(p => assert(math.abs(p - 1.0) < 1e-12))
  }

  test("gapFillDaily: silent days carry the last observed value forward") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "u1", 10.0),
      (2L, "2024-01-01 18:00:00", "u1", 11.0), // later same day wins
      (3L, "2024-01-04 10:00:00", "u1", 40.0))
    val r = Series.gapFillDaily(e, "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("day", "value", "is_observed")
      .as[(java.sql.Date, Double, Int)].collect().toSeq
    assert(r.map(_._2) === Seq(11.0, 11.0, 11.0, 40.0))
    assert(r.map(_._3) === Seq(1, 0, 0, 1))
  }

  test("olsFit on constant x returns NULL slope/r2, never NaN or Infinity") {
    val xy = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("x", "y")
    val r = Series.olsFit(xy, "x", "y").head()
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }

  test("dailyStreaks matches brute force on seeded random activity sets") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(400) {
      val u = s"u${rnd.nextInt(12)}"
      val day = 1 + rnd.nextInt(28)
      (rnd.nextLong().abs, f"2024-01-$day%02d 12:00:00", u, 1.0)
    }
    val expected = rows.groupBy(_._3).map { case (u, rs) =>
      val days = rs.map(r => r._2.substring(8, 10).toInt).distinct.sorted
      val runs = days.foldLeft(List.empty[Int]) {
        case (len :: tail, d) if days.contains(d - 1) => (len + 1) :: tail
        case (acc, _) => 1 :: acc
      }
      u -> (days.size.toLong, runs.size.toLong, runs.max.toLong)
    }
    val got = Series.dailyStreaks(ev(rows: _*), "user_id", "ts")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === expected)
  }

  test("olsFit recovers an exact linear relation (r2 = 1)") {
    val xy = Seq((0, 3), (1, 5), (2, 7), (3, 9)).toDF("x", "y")
    val Array(row) = Series.olsFit(xy, "x", "y").collect()
    assert(row.getLong(0) === 4L)
    assert(row.getDouble(1) === 2.0) // slope
    assert(row.getDouble(2) === 3.0) // intercept
    assert(row.getDouble(3) === 1.0) // r2
  }

  test("sparseCosinePairs: identical docs hit cosine 1, disjoint docs never pair") {
    val docs = Seq(
      (1L, "en", Seq("a", "b", "a")),
      (2L, "en", Seq("a", "b", "a")),   // identical multiset → cos 1
      (3L, "en", Seq("z", "q")),        // disjoint from 1/2
      (4L, "de", Seq("a", "b", "a")))   // other block — must not pair
      .toDF("doc_id", "lang", "toks")
    val r = Similarity.sparseCosinePairs(docs, "doc_id", "toks", Seq("lang"), 64)
      .select("id_a", "id_b", "cos")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // sqrt(ss)·sqrt(ss) rounds (sqrt(5)² ≠ 5 in IEEE) — the fixed op
    // sequence is what both engines share, not algebraic identities
    assert(r.map(t => (t._1, t._2)) === Seq((1L, 2L)))
    assert(math.abs(r.head._3 - 1.0) < 1e-12)
  }

  test("sparseCosinePairs df cap drops stop-terms from vectors and norms") {
    // "the" appears in all 3 docs (df 3 > cap 2) → only "x"/"y" survive
    val docs = Seq(
      (1L, "en", Seq("the", "x")),
      (2L, "en", Seq("the", "x")),
      (3L, "en", Seq("the", "y")))
      .toDF("doc_id", "lang", "toks")
    val r = Similarity.sparseCosinePairs(docs, "doc_id", "toks", Seq("lang"), 2)
      .select("id_a", "id_b", "cos")
      .as[(Long, Long, Double)].collect().toSeq
    assert(r === Seq((1L, 2L, 1.0))) // doc3 shares only the pruned term
  }

  test("autocorr: alternating series has acf(1) = -1, acf(2) = +1") {
    import spark.implicits._
    val s = (0 until 20).map(i => (i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("t", "x")
    val got = Series.autocorr(s, "t", "x", 2)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1) === ((19L, -1.0)))
    assert(got(2) === ((18L, 1.0)))
  }

  test("autocorr: gaps drop pairs instead of fabricating adjacency; constant -> NULL") {
    import spark.implicits._
    // t = 0,1,2,10: lag-1 pairs are (0,1),(1,2) only — never (2,10)
    val s = Seq((0L, 1.0), (1L, 2.0), (2L, 4.0), (10L, 8.0)).toDF("t", "x")
    val n = Series.autocorr(s, "t", "x", 1).select("n_pairs")
      .head().getLong(0)
    assert(n === 2L)
    val const = Seq((0L, 5.0), (1L, 5.0), (2L, 5.0)).toDF("t", "x")
    val row = Series.autocorr(const, "t", "x", 1).head()
    assert(row.isNullAt(row.fieldIndex("acf")), "zero variance must be NULL")
  }

  test("autocorr matches a driver-side Pearson on a seeded random gapped series") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    val pts = (0 until 60).filter(_ => rnd.nextDouble() < 0.8)
      .map(i => (i.toLong, rnd.nextInt(1000) / 10.0))
    for (lag <- 1 to 3) {
      val pairs = for {
        (t, x) <- pts; (t2, y) <- pts if t2 == t + lag
      } yield (x, y)
      val n = pairs.size.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val want = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      val got = Series.autocorr(pts.toDF("t", "x"), "t", "x", 3)
        .filter(col("lag") === lag).head().getDouble(2)
      assert(math.abs(got - want) < 1e-6, s"lag $lag: $got vs $want")
    }
  }

  test("cusumChangepoint finds a step boundary with the right direction") {
    import spark.implicits._
    // step UP after t=4 (values 0,0,0,0,0 then 10,10,10,10,10)
    val up = (0 until 10).map(i => (i.toLong, if (i < 5) 0L else 10L))
      .toDF("t", "v")
    val r = Series.cusumChangepoint(up, "t", "v").head()
    assert(r.getAs[Long]("t") === 4L, "split maximizes at the last low point")
    assert(r.getAs[Int]("direction") === 1)
    assert(r.getAs[Long]("g_stat") === 250L) // |10*250 - 5*500| ... n*P-i*T
    val down = (0 until 10).map(i => (i.toLong, if (i < 5) 10L else 0L))
      .toDF("t", "v")
    val r2 = Series.cusumChangepoint(down, "t", "v").head()
    assert(r2.getAs[Long]("t") === 4L)
    assert(r2.getAs[Int]("direction") === -1)
  }

  test("kaplanMeier reproduces the textbook product-limit curve with censoring") {
    import spark.implicits._
    // classic toy: events at 1,1,2,4; censored at 2,3 (6 subjects)
    val subj = Seq((1L, 1), (1L, 1), (2L, 1), (2L, 0), (3L, 0), (4L, 1))
      .toDF("dur", "event")
    val got = Series.kaplanMeier(subj, "dur", "event")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // t=1: risk 6, d 2 -> 4/6; t=2: risk 4, d 1 -> (4/6)(3/4);
    // t=4: risk 1, d 1 -> 0
    assert(got(1L) === ((6L, 2L, 1.0 - 2.0 / 6.0)))
    assert(got(2L) === ((4L, 1L, (1.0 - 2.0 / 6.0) * (1.0 - 1.0 / 4.0))))
    assert(got(4L) === ((1L, 1L, 0.0)))
    assert(!got.contains(3L), "censor-only times emit no curve row")
  }

  test("kaplanMeier: censoring keeps subjects in earlier risk sets") {
    import spark.implicits._
    // without the censored row, S(2) = 0.5*0 — with it, risk at 2 is 2
    val subj = Seq((1L, 1), (2L, 1), (3L, 0)).toDF("dur", "event")
    val got = Series.kaplanMeier(subj, "dur", "event")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got(1L) === 1.0 - 1.0 / 3.0)
    assert(got(2L) === (1.0 - 1.0 / 3.0) * (1.0 - 1.0 / 2.0))
  }

  test("seasonal profile: DOW partition is complete and residual means recompute") {
    // sf0.001's daily series is GAPPY: full 7-day windows survive only
    // where a whole week of consecutive order days exists, so not every
    // DOW need appear — that filter behaving is exactly what's asserted
    val rows = graft.queries.SeriesQueries.seasonalProfile.run(spark, Sf001)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("dow")).forall(d => d >= 0 && d <= 6))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0)
      val want = r.getAs[Long]("sum_resid7").toDouble /
        (r.getAs[Long]("n_days") * 7L)
      assert(r.getAs[Double]("mean_resid_cents") === want)
    }
    // the denser sf0.01 series has full windows on EVERY weekday
    val dense = graft.queries.SeriesQueries.seasonalProfile
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(dense.map(_.getAs[Int]("dow")).toSet === (0 to 6).toSet)
  }

  test("ewma query: the ordered fold replays driver-side over the real series") {
    import spark.implicits._
    val r = graft.queries.SeriesQueries.ewma.run(spark, Sf001).collect().head
    val daily = graft.Tables.orders(spark, Sf001)
      .groupBy(datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date")).cast("long").as("t"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("x"))
      .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    assert(r.getAs[Long]("n_days") === daily.length.toLong)
    val want = daily.tail.foldLeft(daily.head)((acc, x) => acc * 0.8 + x * 0.2)
    assert(r.getAs[Double]("ewma_level") === want, "bit-identical fold")
    // the level is recency-weighted: it sits inside the series range
    assert(want >= daily.min && want <= daily.max)
  }

  test("sax motifs: quartiles are balanced and supports recount driver-side") {
    val rows = graft.queries.SeriesQueries.saxMotifs.run(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[String]("motif")
      assert(m.length === 3 && m.forall(c => c >= '1' && c <= '4'))
      assert(r.getAs[Long]("support") >= 2L)
    }
    // recount one motif from the raw series using exact quartile ranks
    import spark.implicits._
    val daily = graft.Tables.orders(spark, Sf001)
      .groupBy(datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date")).as("t"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("v"))
      .as[(Int, Long)].collect().sortBy(x => (x._2, x._1))
    val n = daily.length
    val tile = daily.zipWithIndex.map { case ((t, _), i) =>
      // ntile(4) boundaries: first n%4 tiles take ceil(n/4)
      val q = n / 4; val r = n % 4
      val big = r * (q + 1)
      t -> (if (i < big) i / (q + 1) + 1 else r + (i - big) / q + 1)
    }.toMap
    val motifs = daily.map(_._1).sorted.flatMap { t =>
      (tile.get(t), tile.get(t + 1), tile.get(t + 2)) match {
        case (Some(a), Some(b), Some(c)) => Some(s"$a$b$c")
        case _ => None
      }
    }.groupBy(identity).map { case (k, xs) => k -> xs.length }
    rows.foreach { r =>
      assert(motifs(r.getAs[String]("motif")) === r.getAs[Long]("support"))
    }
  }

  test("cusumChangepoint matches a driver-side argmax on seeded random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(57)
    for (_ <- 1 to 5) {
      val vs = (0 until 40).map(i =>
        (i.toLong, (rnd.nextInt(100) + (if (i > 25) 300 else 0)).toLong))
      val n = vs.size.toLong
      val tv = vs.map(_._2).sum
      var p = 0L
      val devs = vs.zipWithIndex.map { case ((t, v), i0) =>
        p += v; (t, n * p - (i0 + 1) * tv)
      }
      val (wantT, wantDev) = devs.maxBy { case (t, d) => (math.abs(d), -t) }
      val r = Series.cusumChangepoint(vs.toDF("t", "v"), "t", "v").head()
      assert(r.getAs[Long]("t") === wantT)
      assert(r.getAs[Long]("g_stat") === math.abs(wantDev))
    }
  }
}
