package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The unrestricted metric must agree with breadth-first search over the
  * raw edit operations {insert, delete, substitute, adjacent-swap} — the
  * definition itself, with no DP cleverness to share a bug with. BFS is
  * exponential, so the property runs on short strings over a tiny
  * alphabet, which is also where OSA and unrestricted DL disagree
  * ("ca"→"abc") — the case a wrong shortcut implementation passes
  * round-trips on but fails here. */
class DamerauLevenshteinSpec extends SparkSpec {

  private def bfsDistance(a: String, b: String, cap: Int = 6): Int = {
    if (a == b) return 0
    val alphabet = (a + b).toSet.toSeq
    var frontier = Set(a)
    var seen = Set(a)
    var dist = 0
    while (dist < cap) {
      dist += 1
      val next = scala.collection.mutable.Set.empty[String]
      for (s <- frontier) {
        // substitutions + insertions + deletions + adjacent swaps
        for (i <- 0 until s.length; c <- alphabet if s(i) != c)
          next += s.updated(i, c)
        for (i <- 0 to s.length; c <- alphabet)
          next += (s.take(i) + c + s.drop(i))
        for (i <- 0 until s.length)
          next += (s.take(i) + s.drop(i + 1))
        for (i <- 0 until s.length - 1)
          next += (s.take(i) + s(i + 1) + s(i) + s.drop(i + 2))
      }
      if (next.contains(b)) return dist
      frontier = next.toSet -- seen
      seen ++= frontier
    }
    cap
  }

  test("canonical unrestricted cases (where OSA disagrees)") {
    assert(DamerauLevenshtein.distance("ca", "abc") === 2)
    assert(DamerauLevenshtein.distance("abcd", "acbd") === 1)
    assert(DamerauLevenshtein.distance("", "abc") === 3)
    assert(DamerauLevenshtein.distance("abc", "") === 3)
    assert(DamerauLevenshtein.distance("same", "same") === 0)
  }

  test("property: agrees with BFS over raw edit ops on random short strings") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val a = Seq.fill(rng.nextInt(5))("abc" (rng.nextInt(3))).mkString
      val b = Seq.fill(rng.nextInt(5))("abc" (rng.nextInt(3))).mkString
      val expect = bfsDistance(a, b)
      assert(DamerauLevenshtein.distance(a, b) === expect,
        s"dl('$a','$b')")
    }
  }

  test("oversize input nulls instead of allocating quadratic memory") {
    val big = "x" * (DamerauLevenshtein.MaxLen + 1)
    assert(DamerauLevenshtein.distance(big, "x") === -1)
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val r = Seq((big, "x")).toDF("a", "b")
      .selectExpr("damerau_levenshtein(a, b) AS d").head()
    assert(r.isNullAt(0))
  }

  test("SQL surface matches the column API inside codegen") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val got = Seq(("kitten", "sitting"), ("ca", "abc"), ("ba", "ab"))
      .toDF("a", "b")
      .selectExpr("damerau_levenshtein(a, b) AS d")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(3, 2, 1))
  }
}
