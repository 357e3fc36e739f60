package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrontierSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-local truth: per-x representative (max y, min id), then keep
    * reps no other rep dominates (x' > x with y' ≥ y). */
  private def bruteForce(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val reps = rows.groupBy(_._2).map { case (_, g) =>
      g.minBy(r => (-r._3, r._1))
    }.toSeq
    reps.filter(r => !reps.exists(o => o._2 > r._2 && o._3 >= r._3)).toSet
  }

  test("pareto frontier equals brute force on random data at several partition counts") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 300L).map(id =>
      (id, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val expect = bruteForce(rows)
    for (parts <- Seq(1, 3, 13); nBuckets <- Seq(1, 4, 32)) {
      val df = rows.toDF("id", "x", "y").repartition(parts)
      val got = Frontier.paretoMax(df, "id", "x", "y", nBuckets)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expect, s"parts=$parts nBuckets=$nBuckets")
    }
  }

  test("frontier y-values strictly decrease as x increases") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(id =>
      (id, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    val got = Frontier.paretoMax(rows.toDF("id", "x", "y"), "id", "x", "y")
      .orderBy("x").as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 < b._2 && a._3 > b._3, s"$a then $b")
      case _ => ()
    }
    // the global max-x and max-y representatives always survive
    val maxX = rows.map(_._2).max
    val maxY = rows.map(_._3).max
    assert(got.last._2 === maxX)
    assert(got.head._3 === maxY)
  }

  test("single point, duplicate points, and all-equal-x degeneracies") {
    val one = Frontier.paretoMax(Seq((5L, 3L, 4L)).toDF("id", "x", "y"),
      "id", "x", "y").as[(Long, Long, Long)].collect()
    assert(one.toSeq === Seq((5L, 3L, 4L)))
    // equal (x, y): smallest id is the representative
    val dup = Frontier.paretoMax(
      Seq((9L, 3L, 4L), (2L, 3L, 4L)).toDF("id", "x", "y"),
      "id", "x", "y").as[(Long, Long, Long)].collect()
    assert(dup.toSeq === Seq((2L, 3L, 4L)))
    // all same x: only the best y survives
    val vert = Frontier.paretoMax(
      Seq((1L, 3L, 1L), (2L, 3L, 9L), (3L, 3L, 5L)).toDF("id", "x", "y"),
      "id", "x", "y").as[(Long, Long, Long)].collect()
    assert(vert.toSeq === Seq((2L, 3L, 9L)))
  }

  test("property: frontier equals brute force over many random shapes") {
    // 12 deterministic seeds spanning dense-collision and sparse regimes,
    // random sizes and bucket counts — the single-dataset test's
    // many-worlds extension
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed * 1000 + 7)
      val n = 20 + rnd.nextInt(120)
      val range = 1 + rnd.nextInt(if (seed % 2 == 0) 8 else 200)
      val rows = (1L to n.toLong).map(id =>
        (id, rnd.nextInt(range).toLong, rnd.nextInt(range).toLong))
      val nBuckets = 1 + rnd.nextInt(40)
      val got = Frontier.paretoMax(
          rows.toDF("id", "x", "y").repartition(1 + rnd.nextInt(7)),
          "id", "x", "y", nBuckets)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === bruteForce(rows),
        s"seed=$seed n=$n range=$range nBuckets=$nBuckets")
    }
  }

  test("y = Long.MinValue is a valid frontier value, not a dropped sentinel") {
    val one = Frontier.paretoMax(
      Seq((1L, 10L, Long.MinValue)).toDF("id", "x", "y"),
      "id", "x", "y").as[(Long, Long, Long)].collect()
    assert(one.toSeq === Seq((1L, 10L, Long.MinValue)))
    // with a real dominator the MinValue row still loses
    val two = Frontier.paretoMax(
      Seq((1L, 10L, Long.MinValue), (2L, 11L, 0L)).toDF("id", "x", "y"),
      "id", "x", "y").orderBy("x").as[(Long, Long, Long)].collect()
    assert(two.toSeq === Seq((2L, 11L, 0L)))
  }

  test("NULL x or y rows are excluded, not crashed on") {
    val df = Seq(
      (1L, Some(3L), Some(4L)),
      (2L, None, Some(9L)),
      (3L, Some(5L), None)).toDF("id", "x", "y")
    val got = Frontier.paretoMax(df, "id", "x", "y")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 3L, 4L)))
  }
}
