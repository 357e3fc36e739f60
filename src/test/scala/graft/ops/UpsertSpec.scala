package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "v")

  test("merge applies update / insert / delete in one pass") {
    val changes = Seq(
      (2L, Some("B"), Option.empty[Double], false), // update name only
      (4L, Some("d"), Some(40.0), false),           // insert
      (3L, Option.empty[String], Option.empty[Double], true)) // delete
      .toDF("id", "name", "v", "del")
    val merged = Upsert.merge(snapshot, changes, "id", "del")
      .orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(merged === Seq(
      (1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0)))
  }

  test("merge fails loudly on duplicate changeset keys (MERGE contract)") {
    val dup = Seq(
      (2L, Some("B"), Option.empty[Double], false),
      (2L, Some("BB"), Option.empty[Double], false))
      .toDF("id", "name", "v", "del")
    val e = intercept[Exception] {
      Upsert.merge(snapshot, dup, "id", "del").collect()
    }
    assert(e.getMessage.contains("multiple change rows")
      || Option(e.getCause).exists(_.getMessage.contains("multiple change rows")),
      e.getMessage)
  }
}
