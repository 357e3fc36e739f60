package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The automaton must agree with the obvious quadratic counter on every
  * input — overlaps, nested patterns, and patterns sharing prefixes are
  * exactly where a broken fail-link construction stays self-consistent
  * while silently dropping matches, so the property test runs against
  * random texts over a tiny alphabet (maximizing overlap density), not
  * just happy-path prose. */
class AhoCorasickSpec extends SparkSpec {

  private def naive(text: String, p: String): Long =
    (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).max(0).toLong

  private def counts(auto: AhoCorasick, text: String): Seq[Long] = {
    val arr = auto.countAll(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getLong)
  }

  test("overlapping and nested matches count like the naive scan") {
    val pats = Array("a", "aa", "aba", "ab", "ba", "abab")
    val auto = new AhoCorasick(pats)
    for (text <- Seq("", "a", "aaaa", "ababab", "abba", "baab", "aabaa")) {
      assert(counts(auto, text) === pats.toSeq.map(naive(text, _)),
        s"text=$text")
    }
  }

  test("property: random small-alphabet texts match the naive counter") {
    val pats = Array("a", "ab", "ba", "aab", "bba", "abab", "b")
    val auto = new AhoCorasick(pats)
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val text = Seq.fill(rng.nextInt(40))(
        if (rng.nextBoolean()) 'a' else 'b').mkString
      assert(counts(auto, text) === pats.toSeq.map(naive(text, _)),
        s"text=$text")
    }
  }

  test("dictionary with spaces and shared prefixes, via the SQL surface") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val got = Seq("a a a scan table", "tablet ca n").toDF("text")
      .selectExpr(
        "multi_pattern_count(text, 'a', 'a a', 'scan', 'ca', 'table', 'tab') AS c")
      .collect().map(_.getSeq[Long](0))
    // "a a a scan table": a×4 (3 bare + inside scan? no — 'a' occurs in
    // "a a a" (3), "scan" (1), "table" (1) = 5; "a a" overlapping = 2
    assert(got(0) === Seq(5L, 2L, 1L, 1L, 1L, 1L))
    // "tablet ca n": a×2, no "a a", no scan, ca×1, "table" inside
    // "tablet"×1, tab×1
    assert(got(1) === Seq(2L, 0L, 0L, 1L, 1L, 1L))
  }
}
