package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LevenshteinPruningSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "kitten", "sitting"),   // dist 3, len diff 1
    (2L, "abc", "abcdefghij"),   // dist 7, len diff 7 → guard prunes at k=2
    (3L, "same", "same"),        // dist 0
    (4L, null.asInstanceOf[String], "x")) // null row — filter drops either way

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(LevenshteinPruning)
    try body
    finally spark.experimental.extraOptimizations = Nil
  }

  test("filter plan gains the length lower-bound guard, results unchanged") {
    // a parquet-backed relation: a LocalRelation filter would be
    // constant-folded away before the plan can be inspected
    val parts = graft.Tables.part(spark, Sf001)
    val plain = parts.filter(expr("levenshtein(p_name, 'red widget') <= 8"))
      .select("p_partkey").as[Long].collect().sorted
    withRule {
      val guarded = parts.filter(expr("levenshtein(p_name, 'red widget') <= 8"))
      val opt = guarded.queryExecution.optimizedPlan.toString
      assert(opt.contains("length"), opt) // the O(1) guard is in the plan
      assert(opt.contains("levenshtein"), opt)
      assert(guarded.select("p_partkey").as[Long].collect().sorted === plain)
    }
  }

  test("rule is idempotent — re-application adds no second guard") {
    val parts = graft.Tables.part(spark, Sf001)
    withRule {
      val cond = parts.filter(expr("levenshtein(p_name, 'red widget') <= 2"))
      val once = LevenshteinPruning(cond.queryExecution.optimizedPlan)
      assert(once.fastEquals(cond.queryExecution.optimizedPlan),
        s"expected fixpoint, got\n$once")
    }
  }

  test("all four comparison orientations receive the guard") {
    val parts = graft.Tables.part(spark, Sf001)
    withRule {
      Seq("levenshtein(p_name, 'red widget') <= 8",
          "levenshtein(p_name, 'red widget') < 8",
          "8 >= levenshtein(p_name, 'red widget')",
          "8 > levenshtein(p_name, 'red widget')").foreach { pred =>
        val opt = parts.filter(expr(pred))
          .queryExecution.optimizedPlan.toString
        assert(opt.contains("length"), s"$pred:\n$opt")
      }
    }
  }

  test("projections are left alone (null semantics preserved)") {
    val df = docs.toDF("id", "a", "b")
    withRule {
      val proj = df.select(expr("levenshtein(a, b) <= 2").as("close"))
      val opt = proj.queryExecution.optimizedPlan.toString
      assert(!opt.contains("abs"), opt) // no guard outside Filter
      // the null row stays null, not false-by-guard
      assert(proj.filter(col("close").isNull).count() === 1L)
    }
  }

  test("3-arg `<= k` keeps its -1 arm: no guard injected, results unchanged") {
    // levenshtein(a, b, t) returns -1 past the threshold, so `<= k` KEEPS
    // over-threshold rows; a length guard would wrongly drop them.
    val parts = graft.Tables.part(spark, Sf001)
    val pred = "levenshtein(p_name, 'red widget', 3) <= 8"
    val plain = parts.filter(expr(pred))
      .select("p_partkey").as[Long].collect().sorted
    assert(plain.nonEmpty) // the -1 rows must be present to make the test real
    withRule {
      val guarded = parts.filter(expr(pred))
      val opt = guarded.queryExecution.optimizedPlan.toString
      assert(!opt.contains("abs"), opt) // no guard on the 3-arg form
      assert(guarded.select("p_partkey").as[Long].collect().sorted === plain)
    }
  }

  test("3-arg within-threshold orientations gain the abs ≤ t guard") {
    val parts = graft.Tables.part(spark, Sf001)
    withRule {
      Seq("levenshtein(p_name, 'red widget', 12) >= 0",
          "levenshtein(p_name, 'red widget', 12) > -1",
          "levenshtein(p_name, 'red widget', 12) >= 3",
          "0 <= levenshtein(p_name, 'red widget', 12)",
          "2 < levenshtein(p_name, 'red widget', 12)",
          "levenshtein(p_name, 'red widget', 12) = 8",
          "8 = levenshtein(p_name, 'red widget', 12)",
          "levenshtein(p_name, 'red widget') = 8").foreach { pred =>
        val opt = parts.filter(expr(pred))
          .queryExecution.optimizedPlan.toString
        assert(opt.contains("abs("), s"$pred:\n$opt")
      }
      // negative-only forms keep over-threshold pairs — no guard possible
      Seq("levenshtein(p_name, 'red widget', 3) = -1",
          "levenshtein(p_name, 'red widget', 3) <= 8").foreach { pred =>
        val opt = parts.filter(expr(pred))
          .queryExecution.optimizedPlan.toString
        assert(!opt.contains("abs("), s"$pred:\n$opt")
      }
    }
  }

  test("3-arg guard: kept-set equality on every sound orientation") {
    val parts = graft.Tables.part(spark, Sf001)
    Seq("levenshtein(p_name, 'red widget', 12) >= 0",
        "levenshtein(p_name, 'red widget', 12) >= 6",
        "levenshtein(p_name, 'red widget', 12) > -1",
        "levenshtein(p_name, 'red widget', 12) = 8",
        "levenshtein(p_name, 'red widget') = 8").foreach { pred =>
      val plain = parts.filter(expr(pred))
        .select("p_partkey").as[Long].collect().sorted
      val guarded = withRule {
        parts.filter(expr(pred)).select("p_partkey").as[Long].collect().sorted
      }
      assert(guarded === plain, pred)
    }
    // the property holds on adversarial random pairs too (length gaps
    // both inside and outside the threshold, distances straddling it)
    val rnd = new scala.util.Random(13)
    val pairs = (1L to 300L).map { i =>
      def str() = (0 until rnd.nextInt(14)).map(_ =>
        ('a' + rnd.nextInt(3)).toChar).mkString
      (i, str(), str())
    }
    val df = pairs.toDF("id", "a", "b")
    Seq("levenshtein(a, b, 4) >= 0", "levenshtein(a, b, 4) >= 2",
        "levenshtein(a, b, 4) > -1", "levenshtein(a, b, 4) = 3",
        "levenshtein(a, b) = 3").foreach { pred =>
      val plain = df.filter(expr(pred)).select("id").as[Long].collect().sorted
      val guarded = withRule {
        df.filter(expr(pred)).select("id").as[Long].collect().sorted
      }
      assert(guarded === plain, pred)
    }
  }

  test("guard never changes the kept set on random string pairs") {
    val rnd = new scala.util.Random(11)
    val pairs = (1L to 200L).map { i =>
      def str() = (0 until rnd.nextInt(12)).map(_ =>
        ('a' + rnd.nextInt(4)).toChar).mkString
      (i, str(), str())
    }
    val df = pairs.toDF("id", "a", "b")
    val plain = df.filter(expr("levenshtein(a, b) <= 2"))
      .select("id").as[Long].collect().sorted
    val guarded = withRule {
      df.filter(expr("levenshtein(a, b) <= 2"))
        .select("id").as[Long].collect().sorted
    }
    assert(guarded === plain)
  }
}
