package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables._

/** Reference-derived relational surface (SURVEY §2a), re-expressed as lazy
  * DataFrame pipelines over the driver's test tables.
  *
  * Determinism rules (SURVEY §5): explicit ORDER BY everywhere; money sums
  * go through DECIMAL so the result is independent of partition/merge order
  * (a float sum's low bits depend on reduction order — fatal for the
  * driver's hash compare at any scale); averages/correlations are rounded.
  */
object RelationalQueries {

  /** Flagship (SURVEY §7.2): the reference's whole ETL in miniature —
    * scan → derive year/month (F7) → group-by median (A1) + money sum →
    * 2-hop inner join (J1) → deterministic order.
    * Reference: /root/reference/untitled.py:81,85 (median rollup + join).
    *
    * Scale: lineitem⋈orders is a shuffle join on the fact keys (both huge at
    * 100 TB — correct); customer is the small dim side and is broadcast
    * explicitly so the second join never shuffles the fact stream again.
    */
  val monthlyRollup = QuerySpec(
    "q_monthly_rollup",
    (s, d) => {
      val li = lineitem(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(
          col("c_mktsegment"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"))
        .agg(
          median(col("l_quantity")).as("med_qty"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("decimal(38,4)").as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("c_mktsegment", "o_year", "o_month")
    },
    Some("""
      SELECT c_mktsegment,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(month(o_orderdate) AS INTEGER) AS o_month,
             median(l_quantity) AS med_qty,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
             count(*) AS n_rows
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """))

  val all: Seq[QuerySpec] = Seq(monthlyRollup)
}
