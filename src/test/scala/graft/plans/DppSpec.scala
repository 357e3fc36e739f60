package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.DynamicPruning
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning gate (VERDICT r10 item 6).
  *
  * The codes-table probe prunes STATICALLY — the probed cells are
  * literals, so the partition filter is known at plan time. At 100 TB
  * the commoner shape is JOIN-DERIVED pruning: a fact table partitioned
  * by date joined to a filtered dimension, where the set of surviving
  * partitions is only known once the dim side is evaluated. Spark's DPP
  * plants a `DynamicPruningExpression` in the fact scan's partition
  * filters and feeds it the dim-side join keys (reusing the broadcast
  * when the join is broadcast — zero extra work; falling back to a
  * subquery otherwise, gated by
  * `spark.sql.optimizer.dynamicPartitionPruningFallbackFilterRatio`).
  * If that rule ever stopped firing on this shape, every date-dim join
  * over a partitioned fact would silently become a full scan — invisible
  * to any correctness gate, catastrophic at scale. This spec pins (1)
  * the expression's presence in the scan and (2) the RUNTIME
  * partitions-read count == the dim-selected day count, not the table's.
  */
class DppSpec extends SparkSpec {

  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
    case q: QueryStageExec => scansOf(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scansOf)
  }

  private def hasDpp(s: FileSourceScanExec): Boolean =
    s.partitionFilters.exists(_.exists {
      case _: DynamicPruning => true
      case e => e.getClass.getSimpleName.startsWith("DynamicPruning")
    })

  test("join-derived partition pruning fires and bounds the partitions read") {
    val root = graft.util.TempDirs.scratch("graft-dpp-").toString
    // fact: events partitioned by day — the 100 TB landing layout
    val ev = graft.Tables.events(spark, Sf001)
      .withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(s"$root/fact")
    val fact = spark.read.parquet(s"$root/fact")
    val allDays = ev.select("day").distinct().collect()
      .map(_.getDate(0).toString).sorted
    assert(allDays.length >= 6, "fixture needs enough days to prune")
    val hot = allDays.take(3)
    // dim: one row per day with an attribute the query filters on —
    // written to disk so the filter is a genuine dim-side predicate,
    // not something Catalyst can constant-fold into the fact scan
    import spark.implicits._
    allDays.map(d => (java.sql.Date.valueOf(d), if (hot.contains(d)) 1 else 0))
      .toSeq.toDF("day", "is_hot")
      .write.mode("overwrite").parquet(s"$root/dim")
    val dim = spark.read.parquet(s"$root/dim")

    val q = fact.join(dim.filter(col("is_hot") === 1), Seq("day"))
      .agg(sum("value").as("v"), count(lit(1)).as("n"))

    // (1) the planner planted the dynamic filter in the FACT scan
    val planned = scansOf(q.queryExecution.executedPlan)
      .filter(_.output.exists(_.name == "value")) // column-pruned fact scan
    assert(planned.nonEmpty, "no fact scan in the plan")
    assert(planned.exists(hasDpp),
      s"no DynamicPruningExpression in the fact scan's partition filters:\n" +
        planned.map(_.partitionFilters).mkString("\n"))

    // (2) at runtime the scan read ONLY the dim-selected partitions
    val row = q.collect().head
    val factScan = scansOf(q.queryExecution.executedPlan)
      .filter(_.output.exists(_.name == "value")).find(hasDpp).get
    val partsRead = factScan.metrics("numPartitions").value
    assert(partsRead === hot.length.toLong,
      s"DPP read $partsRead partitions, dim selected ${hot.length} " +
        s"of ${allDays.length}")
    // and the pruned answer is the right answer
    val expected = ev.filter(col("day").isin(hot.map(java.sql.Date.valueOf): _*))
      .agg(sum("value"), count(lit(1))).collect().head
    // float sum across partitions is order-nondeterministic — compare
    // with relative tolerance; the COUNT is the exact pruning witness
    assert(math.abs(row.getDouble(0) - expected.getDouble(0))
      <= 1e-9 * math.abs(expected.getDouble(0)))
    assert(row.getLong(1) === expected.getLong(1))
  }
}
