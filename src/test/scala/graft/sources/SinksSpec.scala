package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", IntegerType)))

  test("csv round-trip preserves rows; partitionBy lays out directories") {
    val dir = Files.createTempDirectory("sinks").toString
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "n")
    Sinks.writeCsv(df, s"$dir/csv", partitionBy = Seq("k"))
    assert(new java.io.File(s"$dir/csv/k=a").exists())
    val back = Sinks.readCsv(spark, s"$dir/csv", StructType(Seq(StructField("n", IntegerType))))
    assert(back.count() === 3)

    Sinks.writeParquet(df, s"$dir/pq", partitionBy = Seq("k"))
    val pq = spark.read.parquet(s"$dir/pq")
    assert(pq.select(sum("n")).head().getLong(0) === 6L)
    // partition pruning: reading one partition dir touches only its rows
    assert(pq.filter(col("k") === "a").count() === 2)
  }
}
