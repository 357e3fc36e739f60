package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class WindowsTextSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestPerKey keeps ALL tied rows (reference max-filter semantics)") {
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1),
      ("a", ts("2024-01-01 12:00:00"), 2),
      ("a", ts("2024-01-01 12:00:00"), 3), // tie on the max
      ("b", ts("2024-01-01 09:00:00"), 4)).toDF("k", "t", "id")
    val got = Windows.latestPerKey(df, Seq("k"), "t")
      .select("id").as[Int].collect().sorted
    assert(got.toSeq === Seq(2, 3, 4))
  }

  test("sessionize: gap boundary — exactly 30min stays, over 30min splits") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L), // gap == 1800s -> same session
      (1L, ts("2024-01-01 11:00:01"), 3L), // gap 1801s -> new session
      (2L, ts("2024-01-01 10:00:00"), 4L)).toDF("user_id", "t", "event_id")
    val got = Windows.sessionize(df, "user_id", "t", 1800, "event_id")
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got(1L) === 1L && got(2L) === 1L)
    assert(got(3L) === 2L)
    assert(got(4L) === 1L)
  }

  test("asOf join: latest dim at-or-before fact time, inclusive tie, null before first dim") {
    val facts = Seq(
      (1L, ts("2024-01-01 10:30:00"), 100L),
      (1L, ts("2024-01-01 09:00:00"), 101L), // before any dim -> null
      (2L, ts("2024-01-01 11:00:00"), 102L)) // dim exists only later -> null
      .toDF("k", "t", "fid")
    val dims = Seq(
      (1L, ts("2024-01-01 10:00:00"), 200L),
      (1L, ts("2024-01-01 10:30:00"), 201L), // equal ts -> inclusive match
      (2L, ts("2024-01-01 12:00:00"), 202L))
      .toDF("k", "t", "did")
    val got = AsOf.joinAsOf(facts, dims, Seq("k"), "t", "t")
      .select("fid", "did").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got === Map(100L -> Some(201L), 101L -> None, 102L -> None))
  }

  test("tokens: lowercases, splits on non-word runs, drops empties") {
    val got = Seq("  Hello,   WORLD!! x ").toDF("t")
      .select(Text.tokens(col("t"))).as[Seq[String]].head()
    assert(got === Seq("hello", "world", "x"))
  }

  test("shingles: n-grams in order; short docs -> empty array") {
    val got = Seq(Seq("a", "b", "c", "d")).toDF("t")
      .select(Text.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(got === Seq("a b c", "b c d"))
    val short = Seq(Seq("a", "b")).toDF("t")
      .select(Text.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(short === Seq.empty)
  }

  test("langGuess: highest marker count wins, zero hits -> und") {
    val hits = Seq(("x", 3, 1), ("y", 0, 2), ("z", 0, 0)).toDF("id", "hits_en", "hits_de")
    val cols = Seq("en" -> col("hits_en"), "de" -> col("hits_de"))
    val got = hits.withColumn("g", Text.langGuess(cols))
      .select("id", "g").as[(String, String)].collect().toMap
    assert(got("x") === "en")
    assert(got("y") === "de")
    assert(got("z") === "und")
  }
}
