package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.Series

/** Parametric / epidemiological statistics surface — the classical
  * mean-comparison and stratified-table tests that complement the
  * nonparametric family in [[QualityQueries]] (Kruskal–Wallis, runs,
  * Wilcoxon, McNemar) the way untitled.py:162-165's correlation loop
  * complements its aggregates: one scan, exact sufficient statistics,
  * one fixed IEEE expression both engines replay identically.
  *
  * Shared discipline (the q_corr / q_kruskal contract):
  *  - values enter as EXACT integers (cents via DECIMAL(18,2)·100);
  *  - per-group sufficient statistics (n, Σv, Σv²) accumulate in
  *    DECIMAL(38,0) — order-free, tie-free, portable;
  *  - the KNOWN group set pivots in fixed order through conditional
  *    aggregation (never a partition-order float fold);
  *  - the test statistic is ONE double expression tree over those exact
  *    operands, rounded at 1e-6; significance verdicts compare the
  *    rounded statistic against a pinned critical value.
  *
  * Scale shape (100 TB): every query is one map-side-combinable
  * aggregate over the fact table (Levene adds one broadcast join of 5
  * group medians); output is a single row regardless of SF.
  */
object StatsQueries {

  private val d38 = "decimal(38,0)"

  /** Cents of a DOUBLE money column as an exact BIGINT. */
  private def cents(c: Column): Column =
    (c.cast("decimal(18,2)") * 100).cast("long")

  private val priorities = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val segments = Seq(
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  /** The testdata's full shipdate span (sf-independent: the generator
    * draws uniformly over it; all seven years populate every SF). */
  private val shipYears = Seq(1995, 1996, 1997, 1998, 1999, 2000, 2001)

  /** Fixed-order Σ Sᵍ²/nᵍ double tree over pivoted group columns. */
  // try_divide: a group ABSENT from a degenerate corpus has n_i = 0 and
  // its term is NULL (DuckDB's x/0), not an ANSI error — the DegenGate
  // single/constant corpora exercise exactly that
  private def sumSq(k: Int): Column =
    (0 until k).map { i =>
      try_divide(col(s"s$i").cast("double") * col(s"s$i").cast("double"),
        col(s"n$i").cast("double"))
    }.reduce(_ + _)

  /** One-way ANOVA F of order value (cents) across the five known
    * priority classes — the parametric companion to [[QualityQueries
    * .kruskalWallis]] on the same grouping. SSB and SSW come from the
    * pivoted exact statistics:
    *   SSB = Σ Sᵍ²/nᵍ − S²/n,   SSW = Σv² − Σ Sᵍ²/nᵍ,
    *   F = (SSB/(k−1)) / (SSW/(n−k)).
    * Significance uses the asymptotic F(4,∞) .05 critical value
    * χ²₍₄,.05₎/4 = 2.371925 — documented approximation: n−k is ≥ 1 500
    * even at sf0.001, where F(4, 1500) ≈ 2.3746 differs in the third
    * decimal and the observed F is nowhere near the boundary. */
  val anova = QuerySpec(
    "q_anova",
    (s, d) => {
      val rows = orders(s, d).select(col("o_orderpriority").as("g"),
        cents(col("o_totalprice")).as("v"))
      val aggs =
        count(lit(1)).as("n") +:
          (sum(col("v").cast(d38)).as("sv") +:
            (sum((col("v").cast(d38)) * col("v")).as("q") +:
              priorities.zipWithIndex.flatMap { case (g, i) => Seq(
                sum(when(col("g") === g, 1L).otherwise(0L)).as(s"n$i"),
                sum(when(col("g") === g, col("v").cast(d38))
                  .otherwise(lit(0).cast(d38))).as(s"s$i"))
              }))
      val piv = rows.agg(aggs.head, aggs.tail: _*)
      val nD = col("n").cast("double")
      val ssb = sumSq(5) -
        try_divide(col("sv").cast("double") * col("sv").cast("double"), nD)
      val ssw = col("q").cast("double") - sumSq(5)
      val f = try_divide(ssb / lit(4.0), try_divide(ssw, nD - lit(5.0)))
      piv.select(col("n"), lit(5).as("k"), round(f, 6).as("f"),
        (round(f, 6) > 2.371925).cast("int").as("significant"))
    },
    Some("""
      WITH rows_ AS (
        SELECT o_orderpriority AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM orders
      ),
      piv AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sv,
               CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS q,
               CAST(sum(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN g = '1-URGENT' THEN CAST(v AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s0,
               CAST(sum(CASE WHEN g = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN g = '2-HIGH' THEN CAST(v AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s1,
               CAST(sum(CASE WHEN g = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN g = '3-MEDIUM' THEN CAST(v AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s2,
               CAST(sum(CASE WHEN g = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n3,
               CAST(sum(CASE WHEN g = '4-NOT SPECIFIED' THEN CAST(v AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s3,
               CAST(sum(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n4,
               CAST(sum(CASE WHEN g = '5-LOW' THEN CAST(v AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s4
        FROM rows_
      ),
      ff AS (
        SELECT n,
               (((CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                  + CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                  + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)
                  + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE))
                 - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                / 4.0)
               / ((CAST(q AS DOUBLE)
                   - (CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                      + CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                      + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)
                      + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE)))
                  / (CAST(n AS DOUBLE) - 5.0)) AS f
        FROM piv
      )
      SELECT n, 5 AS k, round(f, 6) AS f,
             CAST(round(f, 6) > 2.371925 AS INTEGER) AS significant
      FROM ff
    """))

  /** Welch's unequal-variance t-test: BUILDING vs MACHINERY customer
    * account balances (cents). Means and variances come from exact
    * (n, Σv, Σv²) per segment; t and the Welch–Satterthwaite df are one
    * double tree each. Verdict |t| > 1.96 (normal limit — df is in the
    * thousands at every SF the driver runs). */
  val welchT = QuerySpec(
    "q_welch_t",
    (s, d) => {
      val rows = customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"), cents(col("c_acctbal")).as("v"))
      val piv = rows.agg(
        sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "BUILDING", col("v").cast(d38))
          .otherwise(lit(0).cast(d38))).as("s1"),
        sum(when(col("g") === "BUILDING", col("v").cast(d38) * col("v"))
          .otherwise(lit(0).cast(d38))).as("q1"),
        sum(when(col("g") === "MACHINERY", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "MACHINERY", col("v").cast(d38))
          .otherwise(lit(0).cast(d38))).as("s2"),
        sum(when(col("g") === "MACHINERY", col("v").cast(d38) * col("v"))
          .otherwise(lit(0).cast(d38))).as("q2"))
      def m(i: Int) = col(s"s$i").cast("double") / col(s"n$i").cast("double")
      def v(i: Int) = (col(s"q$i").cast("double") -
        col(s"s$i").cast("double") * col(s"s$i").cast("double") /
          col(s"n$i").cast("double")) / (col(s"n$i").cast("double") - 1.0)
      def se2(i: Int) = v(i) / col(s"n$i").cast("double")
      val t = (m(1) - m(2)) / sqrt(se2(1) + se2(2))
      val df = (se2(1) + se2(2)) * (se2(1) + se2(2)) /
        (se2(1) * se2(1) / (col("n1").cast("double") - 1.0) +
          se2(2) * se2(2) / (col("n2").cast("double") - 1.0))
      piv.select(col("n1"), col("n2"), round(t, 6).as("t"),
        round(df, 4).as("df_welch"),
        (abs(round(t, 6)) > 1.96).cast("int").as("significant"))
    },
    Some("""
      WITH rows_ AS (
        SELECT c_mktsegment AS g,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      ),
      piv AS (
        SELECT
          CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(sum(CASE WHEN g = 'BUILDING' THEN CAST(v AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s1,
          CAST(sum(CASE WHEN g = 'BUILDING' THEN CAST(v AS DECIMAL(38,0)) * v ELSE 0 END) AS DECIMAL(38,0)) AS q1,
          CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
          CAST(sum(CASE WHEN g = 'MACHINERY' THEN CAST(v AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s2,
          CAST(sum(CASE WHEN g = 'MACHINERY' THEN CAST(v AS DECIMAL(38,0)) * v ELSE 0 END) AS DECIMAL(38,0)) AS q2
        FROM rows_
      ),
      tt AS (
        SELECT n1, n2,
               (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
               / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
                      + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE)) AS t,
               (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
                + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE))
               * (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
                  + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE))
               / ((((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE))
                  * (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE))
                  / (CAST(n1 AS DOUBLE) - 1.0)
                  + (((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE))
                  * (((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE))
                  / (CAST(n2 AS DOUBLE) - 1.0)) AS df
        FROM piv
      )
      SELECT n1, n2, round(t, 6) AS t, round(df, 4) AS df_welch,
             CAST(abs(round(t, 6)) > 1.96 AS INTEGER) AS significant
      FROM tt
    """))

  /** Brown–Forsythe (median-centered Levene) homogeneity-of-variance
    * test for account balances across the five market segments — the
    * gatekeeper assumption check for [[anova]]-style pooling. Group
    * medians double to exact half-cent integers (cents are < 2⁵³, and
    * the even-n midpoint is a half — both engines interpolate
    * identically), deviations zᵢ = |2v − med2(g)| stay exact BIGINT,
    * and the statistic is one-way ANOVA on z via the same pivoted
    * sufficient statistics. One broadcast join of 5 median rows; one
    * aggregate per pass. Verdict F(4,∞) as in [[anova]]. */
  val levene = QuerySpec(
    "q_levene",
    (s, d) => {
      val rows = customer(s, d)
        .select(col("c_mktsegment").as("g"), cents(col("c_acctbal")).as("v"))
      val med = rows.groupBy("g")
        .agg((median(col("v")) * 2).cast("long").as("med2"))
      val z = rows.join(broadcast(med), "g")
        .select(col("g"), abs(col("v") * 2 - col("med2")).as("z"))
      val aggs =
        count(lit(1)).as("n") +:
          (sum(col("z").cast(d38)).as("sv") +:
            (sum((col("z").cast(d38)) * col("z")).as("q") +:
              segments.zipWithIndex.flatMap { case (g, i) => Seq(
                sum(when(col("g") === g, 1L).otherwise(0L)).as(s"n$i"),
                sum(when(col("g") === g, col("z").cast(d38))
                  .otherwise(lit(0).cast(d38))).as(s"s$i"))
              }))
      val piv = z.agg(aggs.head, aggs.tail: _*)
      val nD = col("n").cast("double")
      val ssb = sumSq(5) -
        try_divide(col("sv").cast("double") * col("sv").cast("double"), nD)
      val ssw = col("q").cast("double") - sumSq(5)
      val f = try_divide(ssb / lit(4.0), try_divide(ssw, nD - lit(5.0)))
      piv.select(col("n"), lit(5).as("k"), round(f, 6).as("f_bf"),
        (round(f, 6) > 2.371925).cast("int").as("significant"))
    },
    Some("""
      WITH rows_ AS (
        SELECT c_mktsegment AS g,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM customer
      ),
      med AS (
        SELECT g, CAST(2 * median(v) AS BIGINT) AS med2 FROM rows_ GROUP BY g
      ),
      z AS (
        SELECT rows_.g, abs(v * 2 - med2) AS z
        FROM rows_ JOIN med USING (g)
      ),
      piv AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sv,
               CAST(sum(CAST(z AS DECIMAL(38,0)) * z) AS DECIMAL(38,0)) AS q,
               CAST(sum(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN g = 'AUTOMOBILE' THEN CAST(z AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s0,
               CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN g = 'BUILDING' THEN CAST(z AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s1,
               CAST(sum(CASE WHEN g = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN g = 'FURNITURE' THEN CAST(z AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s2,
               CAST(sum(CASE WHEN g = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS n3,
               CAST(sum(CASE WHEN g = 'HOUSEHOLD' THEN CAST(z AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s3,
               CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n4,
               CAST(sum(CASE WHEN g = 'MACHINERY' THEN CAST(z AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s4
        FROM z
      ),
      ff AS (
        SELECT n,
               (((CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                  + CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                  + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)
                  + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE))
                 - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                / 4.0)
               / ((CAST(q AS DOUBLE)
                   - (CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                      + CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                      + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)
                      + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE)))
                  / (CAST(n AS DOUBLE) - 5.0)) AS f
        FROM piv
      )
      SELECT n, 5 AS k, round(f, 6) AS f_bf,
             CAST(round(f, 6) > 2.371925 AS INTEGER) AS significant
      FROM ff
    """))

  /** Mantel–Haenszel stratified 2×2 analysis: does a deep discount
    * (l_discount > 0.05) associate with returns (l_returnflag = 'R')
    * after blocking by ship YEAR? Confounding-by-era is exactly what a
    * pooled 2×2 gets wrong; the MH estimator pools per-stratum odds
    * ratios weighted by bᵢcᵢ/nᵢ.
    *
    * The seven strata PIVOT into one row (the q_kruskal conditional-
    * aggregation discipline), so every cross-stratum sum is a FIXED
    * double expression tree over exact integer counts — deterministic
    * under any partitioning, no quantization needed (integer division
    * is a trap here: DuckDB's `//` on DECIMAL routes through DOUBLE,
    * so a DIV-based "exact" form silently diverges past 2⁵³). OR_MH
    * pools aᵢdᵢ/nᵢ over bᵢcᵢ/nᵢ; the continuity-corrected CMH χ²
    * uses Σaᵢ (exact), ΣE[aᵢ], ΣVar[aᵢ]. Verdict χ²₍₁,.05₎ = 3.8415
    * on the rounded statistic. */
  val mantelHaenszel = QuerySpec(
    "q_mantel_haenszel",
    (s, d) => {
      val rows = lineitem(s, d).select(
        year(col("l_shipdate")).as("y"),
        (col("l_discount") > 0.05).cast("int").as("e"),
        (col("l_returnflag") === "R").cast("int").as("r"))
      val aggs = shipYears.zipWithIndex.flatMap { case (yv, i) => Seq(
        sum(when(col("y") === yv && col("e") === 1 && col("r") === 1, 1L)
          .otherwise(0L)).as(s"a$i"),
        sum(when(col("y") === yv && col("e") === 1 && col("r") === 0, 1L)
          .otherwise(0L)).as(s"b$i"),
        sum(when(col("y") === yv && col("e") === 0 && col("r") === 1, 1L)
          .otherwise(0L)).as(s"c$i"),
        sum(when(col("y") === yv && col("e") === 0 && col("r") === 0, 1L)
          .otherwise(0L)).as(s"d$i"))
      }
      val piv = rows.agg(aggs.head, aggs.tail: _*)
      def dbl(e: String): Column = expr(e).cast("double")
      def stratum(i: Int): (Column, Column, Column, Column, Column) = {
        val n = dbl(s"a$i + b$i + c$i + d$i")
        // try_divide: an EMPTY stratum (degenerate corpora) has n = 0 and
        // its terms are NULL (DuckDB's x/0), not an ANSI error
        val rT = try_divide(dbl(s"a$i") * dbl(s"d$i"), n)
        val sT = try_divide(dbl(s"b$i") * dbl(s"c$i"), n)
        val aT = dbl(s"a$i")
        val eT = try_divide(dbl(s"a$i + b$i") * dbl(s"a$i + c$i"), n)
        // V_i = (a+b)/n · (c+d) · (a+c)/n · (b+d)/(n−1): interleaved
        // divisions keep every intermediate ≤ n², far inside double range.
        val vT = try_divide(dbl(s"a$i + b$i"), n) * dbl(s"c$i + d$i") *
          try_divide(dbl(s"a$i + c$i"), n) *
          try_divide(dbl(s"b$i + d$i"), n - lit(1.0))
        (rT, sT, aT, eT, vT)
      }
      val parts = shipYears.indices.map(stratum)
      val rSum = parts.map(_._1).reduce(_ + _)
      val sSum = parts.map(_._2).reduce(_ + _)
      val aSum = parts.map(_._3).reduce(_ + _)
      val eSum = parts.map(_._4).reduce(_ + _)
      val vSum = parts.map(_._5).reduce(_ + _)
      val orMh = try_divide(rSum, sSum)
      val dev = abs(aSum - eSum) - lit(0.5)
      val chi2 = try_divide(dev * dev, vSum)
      piv.select(lit(shipYears.size).as("n_strata"),
        round(orMh, 6).as("or_mh"), round(chi2, 6).as("chi2_cmh"),
        (round(chi2, 6) > 3.8415).cast("int").as("significant"))
    },
    Some {
      val strata = shipYears.indices.map { i =>
        val y = shipYears(i)
        s"""
          CAST(sum(CASE WHEN y = $y AND e = 1 AND r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a$i,
          CAST(sum(CASE WHEN y = $y AND e = 1 AND r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b$i,
          CAST(sum(CASE WHEN y = $y AND e = 0 AND r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c$i,
          CAST(sum(CASE WHEN y = $y AND e = 0 AND r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d$i"""
      }.mkString(",")
      def nD(i: Int) = s"CAST(a$i + b$i + c$i + d$i AS DOUBLE)"
      val rSum = shipYears.indices.map(i =>
        s"CAST(a$i AS DOUBLE) * CAST(d$i AS DOUBLE) / ${nD(i)}")
        .mkString(" + ")
      val sSum = shipYears.indices.map(i =>
        s"CAST(b$i AS DOUBLE) * CAST(c$i AS DOUBLE) / ${nD(i)}")
        .mkString(" + ")
      val aSum = shipYears.indices.map(i => s"CAST(a$i AS DOUBLE)")
        .mkString(" + ")
      val eSum = shipYears.indices.map(i =>
        s"CAST(a$i + b$i AS DOUBLE) * CAST(a$i + c$i AS DOUBLE) / ${nD(i)}")
        .mkString(" + ")
      val vSum = shipYears.indices.map { i =>
        s"""(CAST(a$i + b$i AS DOUBLE) / ${nD(i)}) * CAST(c$i + d$i AS DOUBLE)
            * (CAST(a$i + c$i AS DOUBLE) / ${nD(i)})
            * (CAST(b$i + d$i AS DOUBLE) / (${nD(i)} - 1.0))"""
      }.mkString(" + ")
      s"""
      WITH rows_ AS (
        SELECT year(l_shipdate) AS y,
               CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS e,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        FROM lineitem
      ),
      piv AS (SELECT $strata FROM rows_),
      sums AS (
        SELECT ($rSum) AS rsum,
               ($sSum) AS ssum,
               ($aSum) AS asum,
               ($eSum) AS esum,
               ($vSum) AS vsum
        FROM piv
      )
      SELECT ${shipYears.size} AS n_strata,
             round(rsum / ssum, 6) AS or_mh,
             round((abs(asum - esum) - 0.5) * (abs(asum - esum) - 0.5)
                   / vsum, 6) AS chi2_cmh,
             CAST(round((abs(asum - esum) - 0.5) * (abs(asum - esum) - 0.5)
                   / vsum, 6) > 3.8415 AS INTEGER) AS significant
      FROM sums
      """
    })

  /** Partial autocorrelation of daily revenue at lags 1–3 via
    * Durbin–Levinson on the GATE-PINNED autocorrelations (the q_acf
    * values, each rounded at 1e-6 before composing — the q_partial_corr
    * discipline, so the recursion sees bit-identical inputs in both
    * engines). PACF is the AR-order diagnostic ACF can't give: an AR(p)
    * series cuts off at lag p in PACF while ACF decays forever.
    *   φ₁₁ = r₁;  φ₂₂ = (r₂−r₁²)/(1−r₁²);  φ₂₁ = r₁−φ₂₂r₁;
    *   φ₃₃ = (r₃−φ₂₁r₂−φ₂₂r₁)/(1−φ₂₁r₁−φ₂₂r₂). */
  val pacf = QuerySpec(
    "q_pacf",
    (s, d) => {
      val daily = orders(s, d)
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).as("t"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("x"))
      val rs = Series.autocorr(daily, "t", "x", maxLag = 3)
        .agg(
          max(when(col("lag") === 1, col("acf"))).as("r1"),
          max(when(col("lag") === 2, col("acf"))).as("r2"),
          max(when(col("lag") === 3, col("acf"))).as("r3"))
      val r1 = col("r1"); val r2 = col("r2"); val r3 = col("r3")
      val p2 = (r2 - r1 * r1) / (lit(1.0) - r1 * r1)
      val phi21 = r1 - p2 * r1
      val p3 = (r3 - phi21 * r2 - p2 * r1) /
        (lit(1.0) - phi21 * r1 - p2 * r2)
      rs.select(round(r1, 6).as("pacf1"), round(p2, 6).as("pacf2"),
        round(p3, 6).as("pacf3"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS t,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
        FROM orders GROUP BY 1
      ),
      lags AS (SELECT unnest([1, 2, 3]) AS lag),
      pairs AS (
        SELECT l.lag, a.x AS x, b.x AS y
        FROM daily a JOIN lags l ON true JOIN daily b ON b.t = a.t + l.lag
      ),
      st AS (
        SELECT lag, CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy,
               CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy
        FROM pairs GROUP BY lag
      ),
      acf AS (
        SELECT lag,
               round((n * sxy - sx * sy) /
                     (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
                 AS r
        FROM st
      ),
      rp AS (
        SELECT max(CASE WHEN lag = 1 THEN r END) AS r1,
               max(CASE WHEN lag = 2 THEN r END) AS r2,
               max(CASE WHEN lag = 3 THEN r END) AS r3
        FROM acf
      ),
      dl AS (
        SELECT r1, r2, r3,
               (r2 - r1 * r1) / (1.0 - r1 * r1) AS p2
        FROM rp
      ),
      dl2 AS (
        SELECT r1, r2, r3, p2, r1 - p2 * r1 AS phi21 FROM dl
      )
      SELECT round(r1, 6) AS pacf1, round(p2, 6) AS pacf2,
             round((r3 - phi21 * r2 - p2 * r1) /
                   (1.0 - phi21 * r1 - p2 * r2), 6) AS pacf3
      FROM dl2
    """))

  /** Cross-correlation of daily revenue (x, cents→double) against daily
    * order COUNT (y) at lags −3…3 — the lead/lag diagnostic between two
    * series that [[pacf]]/q_acf can't see (both are single-series). A
    * negative-lag peak means count leads revenue; positive means it
    * trails. Matched pairs per lag via one shifted self-join of the
    * calendar-bounded daily frame; Pearson per lag through the
    * DECIMAL(38,18) sufficient statistics of the q_acf contract. */
  val ccf = QuerySpec(
    "q_ccf",
    (s, d) => {
      val daily = orders(s, d)
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).as("t"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("x"),
          count(lit(1)).cast("double").as("y"))
      val probes = daily.select(col("t"), col("y"),
          explode(array((-3 to 3).map(lit(_)): _*)).as("lag"))
        .select((col("t") - col("lag")).as("t0"), col("lag"), col("y"))
      val pairs = daily.select(col("t").as("t0"), col("x")).join(probes, "t0")
      def dsum(c: Column) = sum(c.cast("decimal(38,18)")).cast("double")
      pairs.groupBy("lag")
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
          dsum(col("x") * col("x")).as("sxx"),
          dsum(col("y") * col("y")).as("syy"),
          dsum(col("x") * col("y")).as("sxy"))
        .select(col("lag"), col("n").cast("long").as("n_pairs"),
          when(
            col("n") * col("sxx") - col("sx") * col("sx") =!= 0.0 &&
              col("n") * col("syy") - col("sy") * col("sy") =!= 0.0,
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6))
            .as("ccf"))
        .orderBy("lag")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS t,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x,
               CAST(count(*) AS DOUBLE) AS y
        FROM orders GROUP BY 1
      ),
      lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag),
      pairs AS (
        SELECT l.lag, a.x AS x, b.y AS y
        FROM daily a JOIN lags l ON true JOIN daily b ON b.t = a.t + l.lag
      ),
      st AS (
        SELECT lag, CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy,
               CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy
        FROM pairs GROUP BY lag
      )
      SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
             CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
                  THEN round((n * sxy - sx * sy) /
                             (sqrt(n * sxx - sx * sx) *
                              sqrt(n * syy - sy * sy)), 6)
             END AS ccf
      FROM st
      ORDER BY lag
    """))

  /** Discrete-Fourier power of daily revenue at the weekly harmonics
    * k = 1, 2, 3 (period 7/k days) — the spectral seasonality probe
    * behind [[SeriesQueries.seasonalProfile]]'s time-domain view. The
    * seven cos/sin basis values per harmonic are TRANSCENDENTAL, so they
    * enter both plans as identical nano-quantized INTEGER literals
    * computed once here (the q_hurst OLS-weights precedent); the
    * projection Σ vᵢ·c_nano(dowᵢ) is then an exact DECIMAL(38,0) integer
    * under any partition order (v in cents). amp_ratio_k =
    * √(Sc²+Ss²)·2/(n·mean) — dimensionless, one double tree. */
  val periodogram = QuerySpec(
    "q_periodogram", {
      // dow → round(cos/sin(2πk·dow/7)·1e9), k = 1..3; identical literals
      // land in the SQL string below via the same expressions.
      (s, d) => {
        val daily = orders(s, d)
          .groupBy(datediff(to_date(col("o_orderdate")),
            lit("1970-01-01").cast("date")).as("t"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("v"))
          .withColumn("dow", pmod(col("t"), lit(7)))
        def basis(k: Int, f: Double => Double): Column =
          coalesce((0 to 6).map { dw =>
            when(col("dow") === dw,
              lit(math.round(f(2.0 * math.Pi * k * dw / 7.0) * 1e9)))
          }: _*)
        val aggs = count(lit(1)).as("n") +:
          (sum(col("v").cast(d38)).as("sv") +:
            (1 to 3).flatMap { k => Seq(
              sum(col("v").cast(d38) * basis(k, math.cos)).as(s"sc$k"),
              sum(col("v").cast(d38) * basis(k, math.sin)).as(s"ss$k"))
            })
        val piv = daily.agg(aggs.head, aggs.tail: _*)
        // try_divide: an all-NULL revenue series (degen hollow) has zero
        // total energy — NULL amplitude (DuckDB's x/0), not an ANSI error
        def amp(k: Int): Column = round(
          try_divide(
            sqrt(col(s"sc$k").cast("double") * col(s"sc$k").cast("double") +
              col(s"ss$k").cast("double") * col(s"ss$k").cast("double")) *
              lit(2.0), col("sv").cast("double") * lit(1e9)), 6)
        piv.select(col("n").as("n_days"), amp(1).as("amp_weekly"),
          amp(2).as("amp_half_week"), amp(3).as("amp_third_week"))
      }
    },
    Some {
      def basisSql(k: Int, f: Double => Double): String =
        "CASE dow " + (0 to 6).map { dw =>
          s"WHEN $dw THEN ${math.round(f(2.0 * math.Pi * k * dw / 7.0) * 1e9)}"
        }.mkString(" ") + " END"
      val projs = (1 to 3).map { k =>
        s"""CAST(sum(CAST(v AS DECIMAL(38,0)) * (${basisSql(k, math.cos)}))
               AS DECIMAL(38,0)) AS sc$k,
            CAST(sum(CAST(v AS DECIMAL(38,0)) * (${basisSql(k, math.sin)}))
               AS DECIMAL(38,0)) AS ss$k"""
      }.mkString(",")
      val amps = (1 to 3).map { k =>
        val nm = Seq("amp_weekly", "amp_half_week", "amp_third_week")(k - 1)
        s"""round(sqrt(CAST(sc$k AS DOUBLE) * CAST(sc$k AS DOUBLE)
                       + CAST(ss$k AS DOUBLE) * CAST(ss$k AS DOUBLE))
                  * 2.0 / (CAST(sv AS DOUBLE) * 1e9), 6) AS $nm"""
      }.mkString(",")
      s"""
      WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS t,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS v
        FROM orders GROUP BY 1
      ),
      dowed AS (SELECT ((t % 7) + 7) % 7 AS dow, v FROM daily),
      piv AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sv,
               $projs
        FROM dowed
      )
      SELECT n AS n_days, $amps FROM piv
      """
    })

  /** Jensen–Shannon divergence between the 1995 and 1996 order-value
    * distributions over q_psi's 20 fixed bins — the bounded, symmetric,
    * zero-tolerant drift measure PSI isn't (PSI drops zero-mass bins;
    * JS's m = (p+q)/2 is nonzero wherever either side has mass, so
    * every populated bin contributes). Per-bin terms p·ln(2p/(p+q))
    * quantize ONCE to nano-units (exact integer cross-bin sum under any
    * order); js = (Σp-terms + Σq-terms)/2 normalized by ln 2 into
    * [0, 1]. */
  val jsDivergence = QuerySpec(
    "q_js_divergence",
    (s, d) => {
      val binned = orders(s, d)
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .select(year(col("o_orderdate")).as("yr"),
          least(floor(col("o_totalprice") / 30000.0), lit(19.0))
            .cast("long").as("bin"))
      val perBin = binned.groupBy("bin").agg(
        sum((col("yr") === 1995).cast("long")).as("c1"),
        sum((col("yr") === 1996).cast("long")).as("c2"))
      val tot = perBin.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      val terms = perBin.crossJoin(broadcast(tot))
        .select(col("bin"), col("c1"), col("c2"),
          // p ln(2p/(p+q)) with p = c1/n1, q = c2/n2: the ratio argument
          // 2(c1/n1)/((c1/n1)+(c2/n2)) = 2·c1·n2/(c1·n2 + c2·n1); the
          // cross products multiply as DOUBLES (c·n would overflow int64
          // at ~10¹⁰ rows/side; identical doubles in both engines since
          // the operands are exact integers), ln, then one nano-cast.
          expr("""CASE WHEN c1 > 0 THEN CAST(round(
                    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) *
                    ln(2.0 * (CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                       / (CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          + CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE))) * 1e9)
                  AS BIGINT) ELSE 0 END""").as("tp"),
          expr("""CASE WHEN c2 > 0 THEN CAST(round(
                    CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) *
                    ln(2.0 * (CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE))
                       / (CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          + CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE))) * 1e9)
                  AS BIGINT) ELSE 0 END""").as("tq"))
      terms.agg(count(lit(1)).as("n_bins"),
          sum("tp").as("sp"), sum("tq").as("sq"))
        .select(col("n_bins"),
          round((col("sp") + col("sq")).cast("double") /
            (lit(2e9) * lit(math.log(2.0))), 6).as("js"))
    },
    Some("""
      WITH binned AS (
        SELECT year(CAST(o_orderdate AS DATE)) AS yr,
               CAST(least(floor(o_totalprice / 30000.0), 19.0) AS BIGINT)
                 AS bin
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
      ),
      per_bin AS (
        SELECT bin,
               CAST(sum(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS BIGINT)
                 AS c1,
               CAST(sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT)
                 AS c2
        FROM binned GROUP BY 1
      ),
      tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                     CAST(sum(c2) AS BIGINT) AS n2 FROM per_bin),
      terms AS (
        SELECT bin,
               CASE WHEN c1 > 0 THEN CAST(round(
                   CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) *
                   ln(2.0 * (CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                      / (CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                         + CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE))) * 1e9)
                 AS BIGINT) ELSE 0 END AS tp,
               CASE WHEN c2 > 0 THEN CAST(round(
                   CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) *
                   ln(2.0 * (CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE))
                      / (CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                         + CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE))) * 1e9)
                 AS BIGINT) ELSE 0 END AS tq
        FROM per_bin CROSS JOIN tot
      )
      SELECT CAST(count(*) AS BIGINT) AS n_bins,
             round(CAST(sum(tp) + sum(tq) AS DOUBLE)
                   / (2e9 * ln(2.0)), 6) AS js
      FROM terms
    """))

  /** t-closeness audit (Li et al. 2007) over q_k_anonymity's quasi-
    * identifier groups (segment × $1000 balance band): per group, the
    * ordered-distance EMD between the group's distribution of the
    * SENSITIVE attribute (order priority of the customer's orders,
    * rank-ordered 1..5) and the global one. For 1-D ordered categories
    * EMD = Σᵢ |CDF_g(i) − CDF(i)| / (k−1); the four CDF differences sit
    * as COLUMNS of one row (fixed 5-level pivot), so the EMD is a fixed
    * double tree over exact integer counts — deterministic under any
    * partitioning — quantized ONCE to nano-units at the end via the
    * round-then-cast idiom (never integer DIV on wide operands: DuckDB's
    * `//` on DECIMAL routes through DOUBLE past 2⁵³). A group passes at
    * t = 0.2 (the paper's worked threshold). Output: one audit row per
    * quasi-group (bounded: groups ≪ rows), worst-first. */
  val tCloseness = QuerySpec(
    "q_t_closeness",
    (s, d) => {
      val joined = customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / 1000.0).cast("int").as("bb"),
          // nullif: an EMPTY priority string (degen hollow) has no level
          // digit — NULL, where a bare ANSI cast of '' errors
          nullif(col("o_orderpriority").substr(1, 1), lit(""))
            .cast("int").as("lvl"))
      def cums(prefix: String) = (1 to 4).map { i =>
        sum(when(col("lvl") <= i, 1L).otherwise(0L)).as(s"$prefix$i") }
      val g = joined.groupBy("seg", "bb")
        .agg(count(lit(1)).as("ng"), cums("cg"): _*)
      val tot = joined.agg(count(lit(1)).as("nn"), cums("ct"): _*)
      val terms = (1 to 4).map { i =>
        abs(col(s"cg$i").cast("double") / col("ng").cast("double") -
          col(s"ct$i").cast("double") / col("nn").cast("double"))
      }.reduce(_ + _)
      g.crossJoin(broadcast(tot))
        .withColumn("__emd", terms)
        .select(col("seg"), col("bb"), col("ng"),
          expr("CAST(round((__emd / 4.0) * 1e9) AS BIGINT)").as("emd_nano"))
        .withColumn("t_close",
          round(col("emd_nano").cast("double") / 1e9, 6))
        .withColumn("passes_t02", (col("emd_nano") <= 200000000L).cast("int"))
        .orderBy(col("emd_nano").desc, col("seg"), col("bb"))
    },
    Some("""
      WITH j AS (
        SELECT c_mktsegment AS seg,
               CAST(floor(c_acctbal / 1000.0) AS INTEGER) AS bb,
               CAST(nullif(substr(o_orderpriority, 1, 1), '')
                 AS INTEGER) AS lvl
        FROM customer JOIN orders ON c_custkey = o_custkey
      ),
      g AS (
        SELECT seg, bb, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(CASE WHEN lvl <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS cg1,
               CAST(sum(CASE WHEN lvl <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS cg2,
               CAST(sum(CASE WHEN lvl <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS cg3,
               CAST(sum(CASE WHEN lvl <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS cg4
        FROM j GROUP BY 1, 2
      ),
      tot AS (
        SELECT CAST(count(*) AS BIGINT) AS nn,
               CAST(sum(CASE WHEN lvl <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS ct1,
               CAST(sum(CASE WHEN lvl <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS ct2,
               CAST(sum(CASE WHEN lvl <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS ct3,
               CAST(sum(CASE WHEN lvl <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS ct4
        FROM j
      ),
      e AS (
        SELECT seg, bb, ng,
               CAST(round(((abs(CAST(cg1 AS DOUBLE) / CAST(ng AS DOUBLE)
                               - CAST(ct1 AS DOUBLE) / CAST(nn AS DOUBLE))
                            + abs(CAST(cg2 AS DOUBLE) / CAST(ng AS DOUBLE)
                                 - CAST(ct2 AS DOUBLE) / CAST(nn AS DOUBLE))
                            + abs(CAST(cg3 AS DOUBLE) / CAST(ng AS DOUBLE)
                                 - CAST(ct3 AS DOUBLE) / CAST(nn AS DOUBLE))
                            + abs(CAST(cg4 AS DOUBLE) / CAST(ng AS DOUBLE)
                                 - CAST(ct4 AS DOUBLE) / CAST(nn AS DOUBLE)))
                           / 4.0) * 1e9) AS BIGINT) AS emd_nano
        FROM g CROSS JOIN tot
      )
      SELECT seg, bb, ng, emd_nano,
             round(CAST(emd_nano AS DOUBLE) / 1e9, 6) AS t_close,
             CAST(emd_nano <= 200000000 AS INTEGER) AS passes_t02
      FROM e
      ORDER BY emd_nano DESC, seg, bb
    """))

  /** Shared daily-revenue OLS residual frame (the q_conformal fit, over
    * ALL days): (t, v cents, e_micro = round(1e6·(v − α − βt))) — the
    * residual quantizes ONCE to micro-cents so every downstream
    * statistic sums exact integers. α, β come from DECIMAL(38,0)
    * sufficient statistics (identical doubles in both engines). */
  private def residualFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val daily = orders(s, d)
      .groupBy(datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date")).cast("long").as("t"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("v"))
    val fit = daily.agg(
      count(lit(1)).as("n"),
      sum(col("t").cast(d38)).as("st"),
      sum(col("v").cast(d38)).as("sv"),
      sum(col("t").cast(d38) * col("t")).as("stt"),
      sum(col("t").cast(d38) * col("v")).as("stv"))
      .select(col("n"),
        // try_divide: a ONE-day series has zero t-variance — NULL trend
        // (DuckDB's x/0), not an ANSI error (degen single corpus)
        try_divide(
          (col("n").cast(d38) * col("stv") - col("st") * col("sv"))
            .cast("double"),
          (col("n").cast(d38) * col("stt") - col("st") * col("st"))
            .cast("double")).as("beta"),
        col("st").cast("double").as("stD"),
        col("sv").cast("double").as("svD"))
      .select(col("n"), col("beta"),
        try_divide(col("svD") - col("beta") * col("stD"),
          col("n").cast("double")).as("alpha"))
    daily.crossJoin(broadcast(fit))
      .select(col("t"), col("v"), col("n"),
        expr("CAST(round((CAST(v AS DOUBLE) - alpha - beta * " +
          "CAST(t AS DOUBLE)) * 1000000) AS BIGINT)").as("e_micro"))
  }

  /** The same residual frame as shared DuckDB CTEs (kept textually in
    * lockstep with [[residualFrame]] — one definition of "the residual"
    * per engine pair). */
  private val ResidualSql = """
      daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS t,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS v
        FROM orders GROUP BY 1
      ),
      fit0 AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(t AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS st,
               CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sv,
               CAST(sum(CAST(t AS DECIMAL(38,0)) * t) AS DECIMAL(38,0))
                 AS stt,
               CAST(sum(CAST(t AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))
                 AS stv
        FROM daily
      ),
      fit1 AS (
        SELECT n,
               CAST(CAST(n AS DECIMAL(38,0)) * stv - st * sv AS DOUBLE)
                 / CAST(CAST(n AS DECIMAL(38,0)) * stt - st * st AS DOUBLE)
                 AS beta,
               CAST(st AS DOUBLE) AS std, CAST(sv AS DOUBLE) AS svd
        FROM fit0
      ),
      fit AS (
        SELECT n, beta, (svd - beta * std) / CAST(n AS DOUBLE) AS alpha
        FROM fit1
      ),
      resid AS (
        SELECT t, v, n,
               CAST(round((CAST(v AS DOUBLE) - alpha - beta
                 * CAST(t AS DOUBLE)) * 1000000) AS BIGINT) AS e_micro
        FROM daily CROSS JOIN fit
      )"""

  /** Durbin–Watson first-order autocorrelation diagnostic on the daily-
    * revenue trend residuals: DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² over the calendar-
    * bounded daily frame (the q_cusum window contract). Micro-quantized
    * residuals make both sums exact DECIMAL(38,0) integers under any
    * partition order; DW ≈ 2(1−ρ̂) ships alongside. */
  val durbinWatson = QuerySpec(
    "q_durbin_watson",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val lagged = residualFrame(s, d)
        .withColumn("e_prev", lag("e_micro", 1).over(W.orderBy("t")))
      lagged.agg(
        count(lit(1)).as("n_days"),
        sum(col("e_micro").cast(d38) * col("e_micro")).as("see"),
        sum(when(col("e_prev").isNotNull,
          (col("e_micro") - col("e_prev")).cast(d38) *
            (col("e_micro") - col("e_prev"))).otherwise(lit(0).cast(d38)))
          .as("sdd"))
        .select(col("n_days"),
          // try_divide: a 1-day series has zero residual energy (see = 0)
          // and DW is NULL (DuckDB's x/0), not an ANSI error
          round(try_divide(col("sdd").cast("double"),
            col("see").cast("double")), 6).as("dw"),
          round(lit(1.0) - try_divide(col("sdd").cast("double"),
            col("see").cast("double")) / 2.0, 6).as("rho_hat"))
    },
    Some(s"""
      WITH $ResidualSql,
      lagged AS (
        SELECT e_micro, lag(e_micro) OVER (ORDER BY t) AS e_prev FROM resid
      ),
      sums AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CAST(e_micro AS DECIMAL(38,0)) * e_micro)
                 AS DECIMAL(38,0)) AS see,
               CAST(sum(CASE WHEN e_prev IS NOT NULL
                 THEN CAST(e_micro - e_prev AS DECIMAL(38,0))
                      * (e_micro - e_prev) ELSE 0 END)
                 AS DECIMAL(38,0)) AS sdd
        FROM lagged
      )
      SELECT n_days,
             round(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE), 6) AS dw,
             round(1.0 - (CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)) / 2.0, 6)
               AS rho_hat
      FROM sums
    """))

  /** Breusch–Pagan heteroscedasticity test on the same residuals: does
    * the SQUARED residual trend with time? BP = n·R² of the auxiliary
    * regression e² ~ t, χ²₍₁₎ under the null. e² is a double product of
    * identical doubles (deterministic at any magnitude), quantized ONCE
    * to cents² (exact to |e| ≤ $3·10⁷/day — daily AGGREGATE residuals;
    * rescale the series before this test if yours exceed that); the
    * auxiliary R² then comes from exact DECIMAL sufficient statistics —
    * one double tree. Verdict 3.8415. */
  val breuschPagan = QuerySpec(
    "q_breusch_pagan",
    (s, d) => {
      val u = residualFrame(s, d).select(col("t"),
        expr("CAST(round((CAST(e_micro AS DOUBLE) / 1e6) " +
          "* (CAST(e_micro AS DOUBLE) / 1e6)) AS BIGINT)").as("u"))
      // sums stay DECIMAL-exact; the r² composition runs in DOUBLES
      // (suu ≈ Σu² can reach 10³⁵, so n·suu would overflow DECIMAL(38)
      // — the composition is a fixed tree on identical doubles, so it
      // stays engine-portable without the decimal headroom)
      u.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("t").cast(d38)).cast("double").as("st"),
        sum(col("u").cast(d38)).cast("double").as("su"),
        sum(col("t").cast(d38) * col("t")).cast("double").as("stt"),
        sum(col("u").cast(d38) * col("u")).cast("double").as("suu"),
        sum(col("t").cast(d38) * col("u")).cast("double").as("stu"))
        .select(col("n").cast("long").as("n"),
          // try_divide: a 1-day series has zero t/u variance — NULL r²
          try_divide(
            ((col("n") * col("stu") - col("st") * col("su")) *
              (col("n") * col("stu") - col("st") * col("su"))),
            ((col("n") * col("stt") - col("st") * col("st")) *
              (col("n") * col("suu") - col("su") * col("su")))).as("r2"))
        .select(col("n").as("n_days"),
          round(col("r2"), 6).as("r2_aux"),
          round(col("n").cast("double") * col("r2"), 6).as("bp"),
          (round(col("n").cast("double") * col("r2"), 6) > 3.8415)
            .cast("int").as("significant"))
    },
    Some(s"""
      WITH $ResidualSql,
      u AS (
        SELECT t, CAST(round((CAST(e_micro AS DOUBLE) / 1e6)
                 * (CAST(e_micro AS DOUBLE) / 1e6)) AS BIGINT) AS u
        FROM resid
      ),
      st AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(t AS DECIMAL(38,0))) AS DOUBLE) AS st,
               CAST(sum(CAST(u AS DECIMAL(38,0))) AS DOUBLE) AS su,
               CAST(sum(CAST(t AS DECIMAL(38,0)) * t) AS DOUBLE) AS stt,
               CAST(sum(CAST(u AS DECIMAL(38,0)) * u) AS DOUBLE) AS suu,
               CAST(sum(CAST(t AS DECIMAL(38,0)) * u) AS DOUBLE) AS stu
        FROM u
      ),
      rr AS (
        SELECT CAST(n AS BIGINT) AS n,
               ((n * stu - st * su) * (n * stu - st * su))
               / ((n * stt - st * st) * (n * suu - su * su)) AS r2
        FROM st
      )
      SELECT n AS n_days, round(r2, 6) AS r2_aux,
             round(CAST(n AS DOUBLE) * r2, 6) AS bp,
             CAST(round(CAST(n AS DOUBLE) * r2, 6) > 3.8415 AS INTEGER)
               AS significant
      FROM rr
    """))

  /** Variance inflation factors for the lineitem feature triple
    * (quantity, extendedprice, discount) — the multicollinearity audit
    * before any regression ships. With three regressors each VIF has
    * the closed form 1/(1−R²ᵢ), R²ᵢ = (r_ij² + r_ik² − 2·r_ij·r_ik·r_jk)
    * / (1 − r_jk²); the pairwise correlations come from ONE scan's
    * DECIMAL(38,18) sufficient statistics and ROUND AT 1e-6 BEFORE
    * composing (the q_partial_corr discipline — the recursion sees
    * bit-identical inputs in both engines). */
  val vif = QuerySpec(
    "q_vif",
    (s, d) => {
      def dsum(c: Column) = sum(c.cast("decimal(38,18)")).cast("double")
      val (q, p, dc) = (col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      // try_divide: one sample (degenerate corpora) has zero variance and
      // the correlation is NULL (DuckDB's x/0), not an ANSI error
      def corrOf(sx: String, sy: String, sxy: String, sxx: String,
          syy: String) = round(
        try_divide(col("n") * col(sxy) - col(sx) * col(sy),
          // greatest(…, 0): the sufficient statistics pass through DOUBLE,
          // so an exactly-zero variance (constant column) can round to a
          // TINY NEGATIVE — sqrt would be NaN here and an ERROR in DuckDB
          sqrt(greatest(col("n") * col(sxx) - col(sx) * col(sx),
            lit(0.0))) *
            sqrt(greatest(col("n") * col(syy) - col(sy) * col(sy),
              lit(0.0)))), 6)
      val rs = lineitem(s, d)
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(q).as("sq"), dsum(p).as("sp"), dsum(dc).as("sd"),
          dsum(q * q).as("sqq"), dsum(p * p).as("spp"),
          dsum(dc * dc).as("sdd"),
          dsum(q * p).as("sqp"), dsum(q * dc).as("sqd"),
          dsum(p * dc).as("spd"))
        .select(
          corrOf("sq", "sp", "sqp", "sqq", "spp").as("r_qp"),
          corrOf("sq", "sd", "sqd", "sqq", "sdd").as("r_qd"),
          corrOf("sp", "sd", "spd", "spp", "sdd").as("r_pd"))
      def r2(ij: String, ik: String, jk: String): Column =
        try_divide(col(ij) * col(ij) + col(ik) * col(ik) -
          lit(2.0) * col(ij) * col(ik) * col(jk),
          lit(1.0) - col(jk) * col(jk))
      rs.select(col("r_qp"), col("r_qd"), col("r_pd"),
        round(try_divide(lit(1.0), lit(1.0) - r2("r_qp", "r_qd", "r_pd")), 6)
          .as("vif_qty"),
        round(try_divide(lit(1.0), lit(1.0) - r2("r_qp", "r_pd", "r_qd")), 6)
          .as("vif_price"),
        round(try_divide(lit(1.0), lit(1.0) - r2("r_qd", "r_pd", "r_qp")), 6)
          .as("vif_disc"))
    },
    Some("""
      WITH st AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,18))) AS DOUBLE) AS sq,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,18))) AS DOUBLE) AS sp,
               CAST(sum(CAST(l_discount AS DECIMAL(38,18))) AS DOUBLE) AS sd,
               CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,18))) AS DOUBLE) AS sqq,
               CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,18))) AS DOUBLE) AS spp,
               CAST(sum(CAST(l_discount * l_discount AS DECIMAL(38,18))) AS DOUBLE) AS sdd,
               CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,18))) AS DOUBLE) AS sqp,
               CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(38,18))) AS DOUBLE) AS sqd,
               CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,18))) AS DOUBLE) AS spd
        FROM lineitem
      ),
      rs AS (
        SELECT round((n * sqp - sq * sp) / (sqrt(greatest(n * sqq - sq * sq, 0))
                 * sqrt(greatest(n * spp - sp * sp, 0))), 6) AS r_qp,
               round((n * sqd - sq * sd) / (sqrt(greatest(n * sqq - sq * sq, 0))
                 * sqrt(greatest(n * sdd - sd * sd, 0))), 6) AS r_qd,
               round((n * spd - sp * sd) / (sqrt(greatest(n * spp - sp * sp, 0))
                 * sqrt(greatest(n * sdd - sd * sd, 0))), 6) AS r_pd
        FROM st
      )
      SELECT r_qp, r_qd, r_pd,
             round(1.0 / (1.0 - (r_qp * r_qp + r_qd * r_qd
               - 2.0 * r_qp * r_qd * r_pd) / (1.0 - r_pd * r_pd)), 6)
               AS vif_qty,
             round(1.0 / (1.0 - (r_qp * r_qp + r_pd * r_pd
               - 2.0 * r_qp * r_pd * r_qd) / (1.0 - r_qd * r_qd)), 6)
               AS vif_price,
             round(1.0 / (1.0 - (r_qd * r_qd + r_pd * r_pd
               - 2.0 * r_qd * r_pd * r_qp) / (1.0 - r_qp * r_qp)), 6)
               AS vif_disc
      FROM rs
    """))

  /** Hosmer–Lemeshow calibration audit of a PINNED logistic returns
    * model (score = −1.2 + 8·discount − 0.02·quantity — auditing a
    * published model is the production shape; fitting lives in
    * q_quality_logreg): observed vs expected returns across the seven
    * populated p̂ bins (p̂ ∈ [0.0975, 0.397] under these coefficients,
    * so floor(20·p̂) ∈ 1…7 — a FIXED bin set, pivoted in order). Per-row
    * p̂ quantizes ONCE to nano-units so every E_g is an exact integer;
    * HL = Σ (O−E)²/(E(1−E/n)) is a fixed 7-term double tree. Verdict
    * χ²₍₅,.05₎ = 11.0705 (g−2 df). */
  val hosmerLemeshow = QuerySpec(
    "q_hosmer_lemeshow",
    (s, d) => {
      val rows = lineitem(s, d).select(
        (col("l_returnflag") === "R").cast("long").as("y"),
        expr("""CAST(round(1e9 / (1.0 + exp(-(-1.2 + 8.0 * l_discount
                 - 0.02 * l_quantity)))) AS BIGINT)""").as("p_nano"))
        .withColumn("g", expr("CAST(p_nano * 20 DIV 1000000000 AS INT)"))
      val aggs = (1 to 7).flatMap { g => Seq(
        sum(when(col("g") === g, 1L).otherwise(0L)).as(s"n$g"),
        sum(when(col("g") === g, col("y")).otherwise(0L)).as(s"o$g"),
        sum(when(col("g") === g, col("p_nano").cast(d38))
          .otherwise(lit(0).cast(d38))).as(s"e$g"))
      }
      val piv = rows.agg(aggs.head, aggs.tail: _*)
      val hl = (1 to 7).map { g =>
        val n = col(s"n$g").cast("double")
        val o = col(s"o$g").cast("double")
        val e = col(s"e$g").cast("double") / 1e9
        when(col(s"n$g") > 0,
          (o - e) * (o - e) / (e * (lit(1.0) - e / n))).otherwise(lit(0.0))
      }.reduce(_ + _)
      piv.select(
        (1 to 7).map(g => col(s"n$g")).reduce(_ + _).as("n_rows"),
        round(hl, 6).as("hl"),
        (round(hl, 6) > 11.0705).cast("int").as("significant"))
    },
    Some {
      val aggs = (1 to 7).map { g =>
        s"""CAST(sum(CASE WHEN g = $g THEN 1 ELSE 0 END) AS BIGINT) AS n$g,
            CAST(sum(CASE WHEN g = $g THEN y ELSE 0 END) AS BIGINT) AS o$g,
            CAST(sum(CASE WHEN g = $g THEN p_nano ELSE 0 END)
              AS DECIMAL(38,0)) AS e$g"""
      }.mkString(",")
      val hl = (1 to 7).map { g =>
        s"""CASE WHEN n$g > 0 THEN
              (CAST(o$g AS DOUBLE) - CAST(e$g AS DOUBLE) / 1e9)
              * (CAST(o$g AS DOUBLE) - CAST(e$g AS DOUBLE) / 1e9)
              / ((CAST(e$g AS DOUBLE) / 1e9)
                 * (1.0 - (CAST(e$g AS DOUBLE) / 1e9) / CAST(n$g AS DOUBLE)))
            ELSE 0.0 END"""
      }.mkString(" + ")
      val nSum = (1 to 7).map(g => s"n$g").mkString(" + ")
      s"""
      WITH rows_ AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               CAST(round(1e9 / (1.0 + exp(-(-1.2 + 8.0 * l_discount
                 - 0.02 * l_quantity)))) AS BIGINT) AS p_nano
        FROM lineitem
      ),
      binned AS (SELECT y, p_nano,
                        CAST(p_nano * 20 // 1000000000 AS INTEGER) AS g
                 FROM rows_),
      piv AS (SELECT $aggs FROM binned)
      SELECT CAST($nSum AS BIGINT) AS n_rows,
             round($hl, 6) AS hl,
             CAST(round($hl, 6) > 11.0705 AS INTEGER) AS significant
      FROM piv
      """
    })

  /** Poisson regression of the daily order count on workday/month-phase
    * features via [[graft.ops.LogReg.trainPoisson]] — the count-data GLM
    * the logistic head can't model. Engine-specific weights ride the
    * in-plan-verdict pattern (q_quality_logreg): deviance monotone after
    * the first Newton step, final gradient ≈ 0, finite weights; the
    * exact day/order counts anchor the oracle. */
  val poissonIrls = QuerySpec(
    "q_poisson_irls",
    (s, d) => {
      // dated orders only (the cusum calendar contract): an undated
      // order has no day to count under, and its NULL features would
      // NULL-poison the IRLS aggregate (hollow DegenGate; the oracle
      // carries the same predicate)
      val daily = orders(s, d)
        .filter(col("o_orderdate").isNotNull)
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("t"))
        .agg(count(lit(1)).cast("double").as("y"))
        .select(col("t"), col("y"),
          (pmod(col("t"), lit(7)) < 5).cast("double").as("x_work"),
          (pmod(col("t"), lit(30)).cast("double") / 30.0).as("x_phase"))
      // zero days → nothing to fit; the verdicts are vacuously true,
      // exactly the oracle's constants (degen `empty` corpus)
      val (monotone, gradOk, finite) =
        if (daily.limit(1).count() == 0) (true, true, true)
        else {
          val fit = graft.ops.LogReg.trainPoisson(daily, "y",
            Seq("x_work", "x_phase"), iters = 4)
          (fit.losses.drop(1).sliding(2)
            .forall(p => p.length < 2 || p(1) <= p(0) + 1e-9),
            fit.gradNorms.last < 1e-6,
            fit.weights.forall(v => !v.isNaN && !v.isInfinite) &&
              fit.losses.forall(v => !v.isNaN && !v.isInfinite))
        }
      daily.agg(count(lit(1)).as("n_days"),
          // coalesce: the oracle counts 0 orders over an empty table,
          // a bare sum would read NULL
          coalesce(sum(col("y").cast("long")), lit(0L)).as("n_orders"))
        .select(col("n_days"), col("n_orders"), lit(4).as("n_iters"),
          lit(if (monotone) 1 else 0).as("deviance_decreasing"),
          lit(if (gradOk) 1 else 0).as("grad_ok"),
          lit(if (finite) 1 else 0).as("weights_finite"))
    },
    Some("""
      SELECT CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
               AS n_days,
             CAST(count(*) AS BIGINT) AS n_orders,
             4 AS n_iters, 1 AS deviance_decreasing, 1 AS grad_ok,
             1 AS weights_finite
      FROM orders WHERE o_orderdate IS NOT NULL
    """))

  /** Friedman test: do the three known order years (1995–1997) rank
    * consistently WITHIN nations? Blocks = the customer's nation,
    * treatments = year, value = the block's exact revenue cents. Ranks
    * within a 3-row block come from the bounded 3×3 self-join (doubled
    * average ranks, so ties stay integer); only complete blocks count.
    * χ²_F = ΣR₂ⱼ²/(4b) − 12b for k = 3 is one double tree over the
    * fixed-order year pivot. Verdict χ²₍₂,.05₎ = 5.9915. */
  val friedman = QuerySpec(
    "q_friedman",
    (s, d) => {
      val yrs = Seq(1995, 1996, 1997)
      val cells = customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(year(col("o_orderdate")).isin(yrs.map(Integer.valueOf): _*))
        .groupBy(col("c_nationkey").as("blk"),
          year(col("o_orderdate")).as("yr"))
        .agg(sum(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("v"))
      val full = cells.groupBy("blk").agg(count(lit(1)).as("__k"))
        .filter(col("__k") === 3).select("blk")
      val kept = cells.join(full, "blk")
      val ranked = kept.as("x").join(kept.as("y"), "blk")
        .groupBy(col("x.blk").as("blk"), col("x.yr").as("yr"))
        .agg((sum((col("y.v") < col("x.v")).cast("long")) * 2 +
          sum((col("y.v") === col("x.v")).cast("long")) + 1).as("r2"))
      val aggs = countDistinct(col("blk")).as("b") +:
        yrs.zipWithIndex.map { case (y, i) =>
          sum(when(col("yr") === y, col("r2")).otherwise(0L)).as(s"rr$i") }
      val piv = ranked.agg(aggs.head, aggs.tail: _*)
      val bD = col("b").cast("double")
      val sumSqR = yrs.indices.map(i =>
        col(s"rr$i").cast("double") * col(s"rr$i").cast("double"))
        .reduce(_ + _)
      val chi2 = sumSqR / (lit(4.0) * bD) - lit(12.0) * bD
      piv.select(col("b").as("n_blocks"), lit(3).as("k"),
        round(chi2, 6).as("chi2_f"),
        (round(chi2, 6) > 5.9915).cast("int").as("significant"))
    },
    Some("""
      WITH cells AS (
        SELECT c_nationkey AS blk, year(CAST(o_orderdate AS DATE)) AS yr,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS v
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996, 1997)
        GROUP BY 1, 2
      ),
      full_ AS (SELECT blk FROM cells GROUP BY blk HAVING count(*) = 3),
      kept AS (SELECT cells.* FROM cells JOIN full_ USING (blk)),
      ranked AS (
        SELECT x.blk, x.yr,
               CAST(2 * sum(CASE WHEN y.v < x.v THEN 1 ELSE 0 END)
                    + sum(CASE WHEN y.v = x.v THEN 1 ELSE 0 END) + 1
                 AS BIGINT) AS r2
        FROM kept x JOIN kept y USING (blk)
        GROUP BY 1, 2
      ),
      piv AS (
        SELECT CAST(count(DISTINCT blk) AS BIGINT) AS b,
               CAST(sum(CASE WHEN yr = 1995 THEN r2 ELSE 0 END) AS BIGINT) AS rr0,
               CAST(sum(CASE WHEN yr = 1996 THEN r2 ELSE 0 END) AS BIGINT) AS rr1,
               CAST(sum(CASE WHEN yr = 1997 THEN r2 ELSE 0 END) AS BIGINT) AS rr2
        FROM ranked
      ),
      ff AS (
        SELECT b,
               (CAST(rr0 AS DOUBLE) * CAST(rr0 AS DOUBLE)
                + CAST(rr1 AS DOUBLE) * CAST(rr1 AS DOUBLE)
                + CAST(rr2 AS DOUBLE) * CAST(rr2 AS DOUBLE))
               / (4.0 * CAST(b AS DOUBLE)) - 12.0 * CAST(b AS DOUBLE) AS chi2
        FROM piv
      )
      SELECT b AS n_blocks, 3 AS k, round(chi2, 6) AS chi2_f,
             CAST(round(chi2, 6) > 5.9915 AS INTEGER) AS significant
      FROM ff
    """))

  /** Grubbs statistic for the most extreme daily-revenue day:
    * G = max|vₜ−v̄|/s. The ARGMAX runs entirely in exact integers —
    * |n·vₜ − Σv| is an exact DECIMAL cross-multiplication, ties to the
    * earliest day — and only the reported G touches doubles (one fixed
    * tree). No verdict column: Grubbs' critical value needs an inverse-t
    * at α/(2n) (n-dependent — not expressible in portable SQL); the
    * judge is the analyst, the engine pins the statistic. */
  val grubbs = QuerySpec(
    "q_grubbs",
    (s, d) => {
      val daily = orders(s, d)
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("t"))
        .agg(sum(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("v"))
      val tot = daily.agg(count(lit(1)).as("n"),
        sum(col("v").cast(d38)).as("sv"),
        sum(col("v").cast(d38) * col("v")).as("svv"))
      val dev = daily.crossJoin(broadcast(tot))
        .withColumn("adev",
          abs(col("n").cast(d38) * col("v") - col("sv")))
      dev.orderBy(col("adev").desc, col("t")).limit(1)
        .select(col("n").as("n_days"), col("t").cast("int").as("outlier_day"),
          // try_divide: a ONE-day series has no sample variance — G is
          // NULL (DuckDB's x/0), not an ANSI error (degen single corpus)
          round(try_divide(
            col("adev").cast("double") / col("n").cast("double"),
            sqrt(try_divide(col("svv").cast("double") -
              col("sv").cast("double") * col("sv").cast("double") /
                col("n").cast("double"),
              col("n").cast("double") - 1.0))), 6).as("g"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS t,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS v
        FROM orders GROUP BY 1
      ),
      tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sv,
               CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS svv
        FROM daily
      ),
      dev AS (
        SELECT t, n, sv, svv,
               abs(CAST(n AS DECIMAL(38,0)) * v - sv) AS adev
        FROM daily CROSS JOIN tot
      )
      SELECT n AS n_days, CAST(t AS INTEGER) AS outlier_day,
             round((CAST(adev AS DOUBLE) / CAST(n AS DOUBLE))
                   / sqrt((CAST(svv AS DOUBLE)
                           - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                             / CAST(n AS DOUBLE))
                          / (CAST(n AS DOUBLE) - 1.0)), 6) AS g
      FROM dev
      ORDER BY adev DESC, t
      LIMIT 1
    """))

  /** Sequential probability ratio test on the lineitem return rate:
    * H₀ p = 0.30 vs H₁ p = 0.34, α = β = 0.05 (boundaries ±ln 19). The
    * log-likelihood ratio accumulates over SHIP DAYS (per-day counts ×
    * nano-quantized per-row LLR constants — the two ln terms enter both
    * plans as identical integer literals), so the running sum is an
    * exact integer over the calendar-bounded daily frame, and the
    * stopping day / decision are exact. A raw per-row scan would be the
    * global-window anti-pattern; daily blocking is how a 100 TB
    * sequential monitor actually runs. */
  val sprt = QuerySpec(
    "q_sprt", {
      val incR = math.round(math.log(0.34 / 0.30) * 1e9) // per 'R' row
      val incN = math.round(math.log(0.66 / 0.70) * 1e9) // per non-R row
      val bound = math.round(math.log(19.0) * 1e9)
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val daily = lineitem(s, d)
          .groupBy(datediff(to_date(col("l_shipdate")),
            lit("1970-01-01").cast("date")).cast("long").as("t"))
          .agg(sum((col("l_returnflag") === "R").cast("long")).as("y"),
            count(lit(1)).as("m"))
          .withColumn("llr",
            sum(col("y") * incR + (col("m") - col("y")) * incN)
              .over(W.orderBy("t").rowsBetween(W.unboundedPreceding,
                W.currentRow)))
        val firsts = daily.agg(
          count(lit(1)).as("n_days"),
          min(when(col("llr") >= bound, col("t"))).as("t_h1"),
          min(when(col("llr") <= -bound, col("t"))).as("t_h0"))
        val stop = firsts.select(col("n_days"),
          when(col("t_h1").isNotNull &&
            (col("t_h0").isNull || col("t_h1") <= col("t_h0")), col("t_h1"))
            .otherwise(col("t_h0")).as("t_stop"),
          when(col("t_h1").isNotNull &&
            (col("t_h0").isNull || col("t_h1") <= col("t_h0")), lit("H1"))
            .when(col("t_h0").isNotNull, lit("H0"))
            .otherwise(lit("continue")).as("decision"))
        daily.select(col("t"), col("llr"))
          .join(broadcast(stop), col("t") === col("t_stop"), "right")
          .select(col("n_days"), col("decision"),
            coalesce(col("t_stop"), lit(-1L)).cast("int").as("stop_day"),
            round(coalesce(col("llr"), lit(0L)).cast("double") / 1e9, 6)
              .as("llr_at_stop"))
      }
    },
    Some {
      val incR = math.round(math.log(0.34 / 0.30) * 1e9)
      val incN = math.round(math.log(0.66 / 0.70) * 1e9)
      val bound = math.round(math.log(19.0) * 1e9)
      s"""
      WITH daily AS (
        SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS t,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                 AS BIGINT) AS y,
               CAST(count(*) AS BIGINT) AS m
        FROM lineitem GROUP BY 1
      ),
      cum AS (
        SELECT t, sum(y * $incR + (m - y) * $incN)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS llr
        FROM daily
      ),
      firsts AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               min(CASE WHEN llr >= $bound THEN t END) AS t_h1,
               min(CASE WHEN llr <= -$bound THEN t END) AS t_h0
        FROM cum
      ),
      stop AS (
        SELECT n_days,
               CASE WHEN t_h1 IS NOT NULL
                      AND (t_h0 IS NULL OR t_h1 <= t_h0) THEN t_h1
                    ELSE t_h0 END AS t_stop,
               CASE WHEN t_h1 IS NOT NULL
                      AND (t_h0 IS NULL OR t_h1 <= t_h0) THEN 'H1'
                    WHEN t_h0 IS NOT NULL THEN 'H0'
                    ELSE 'continue' END AS decision
        FROM firsts
      )
      SELECT s.n_days, s.decision,
             CAST(coalesce(s.t_stop, -1) AS INTEGER) AS stop_day,
             round(CAST(coalesce(c.llr, 0) AS DOUBLE) / 1e9, 6)
               AS llr_at_stop
      FROM stop s LEFT JOIN cum c ON c.t = s.t_stop
      """
    })

  /** Cochran's Q: do the three known years differ in the share of
    * customers with a high-ticket (> $200k) order — among customers
    * ACTIVE in all three (complete blocks, the [[friedman]] discipline
    * on a binary response)? Q = (k−1)(kΣCⱼ² − N²)/(kN − ΣRᵦ²) is
    * integer arithmetic end-to-end (column totals Cⱼ pivot in fixed
    * year order, ΣRᵦ² is one map-side-combinable sum) with one final
    * division. Verdict χ²₍₂,.05₎ = 5.9915. */
  val cochranQ = QuerySpec(
    "q_cochran_q",
    (s, d) => {
      val yrs = Seq(1995, 1996, 1997)
      val cells = orders(s, d)
        .filter(year(col("o_orderdate")).isin(yrs.map(Integer.valueOf): _*))
        .groupBy(col("o_custkey").as("blk"),
          year(col("o_orderdate")).as("yr"))
        .agg(max((col("o_totalprice") > 200000).cast("long")).as("y"))
      val full = cells.groupBy("blk").agg(count(lit(1)).as("__k"))
        .filter(col("__k") === 3).select("blk")
      val kept = cells.join(full, "blk")
      val rows = kept.groupBy("blk").agg(
        sum("y").as("r"),
        yrs.zipWithIndex.map { case (y, i) =>
          sum(when(col("yr") === y, col("y")).otherwise(0L)).as(s"c$i")
        }: _*)
      val aggs = Seq(count(lit(1)).as("b"), sum(col("r")).as("nn"),
        sum(col("r") * col("r")).as("srr")) ++
        yrs.indices.map(i => sum(col(s"c$i")).as(s"cc$i"))
      val piv = rows.agg(aggs.head, aggs.tail: _*)
      val sumC2 = yrs.indices.map(i =>
        col(s"cc$i").cast("double") * col(s"cc$i").cast("double"))
        .reduce(_ + _)
      val nD = col("nn").cast("double")
      val q = lit(2.0) * (lit(3.0) * sumC2 - nD * nD) /
        (lit(3.0) * nD - col("srr").cast("double"))
      piv.select(col("b").as("n_blocks"), lit(3).as("k"),
        round(q, 6).as("q_cochran"),
        (round(q, 6) > 5.9915).cast("int").as("significant"))
    },
    Some("""
      WITH cells AS (
        SELECT o_custkey AS blk, year(CAST(o_orderdate AS DATE)) AS yr,
               CAST(max(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS y
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996, 1997)
        GROUP BY 1, 2
      ),
      full_ AS (SELECT blk FROM cells GROUP BY blk HAVING count(*) = 3),
      rows_ AS (
        SELECT blk, CAST(sum(y) AS BIGINT) AS r,
               CAST(sum(CASE WHEN yr = 1995 THEN y ELSE 0 END) AS BIGINT) AS c0,
               CAST(sum(CASE WHEN yr = 1996 THEN y ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN yr = 1997 THEN y ELSE 0 END) AS BIGINT) AS c2
        FROM cells JOIN full_ USING (blk)
        GROUP BY blk
      ),
      piv AS (
        SELECT CAST(count(*) AS BIGINT) AS b,
               CAST(sum(r) AS BIGINT) AS nn,
               CAST(sum(r * r) AS BIGINT) AS srr,
               CAST(sum(c0) AS BIGINT) AS cc0,
               CAST(sum(c1) AS BIGINT) AS cc1,
               CAST(sum(c2) AS BIGINT) AS cc2
        FROM rows_
      ),
      qq AS (
        SELECT b,
               2.0 * (3.0 * (CAST(cc0 AS DOUBLE) * CAST(cc0 AS DOUBLE)
                             + CAST(cc1 AS DOUBLE) * CAST(cc1 AS DOUBLE)
                             + CAST(cc2 AS DOUBLE) * CAST(cc2 AS DOUBLE))
                      - CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
               / (3.0 * CAST(nn AS DOUBLE) - CAST(srr AS DOUBLE)) AS q
        FROM piv
      )
      SELECT b AS n_blocks, 3 AS k, round(q, 6) AS q_cochran,
             CAST(round(q, 6) > 5.9915 AS INTEGER) AS significant
      FROM qq
    """))

  /** Hellinger distance between the 1995/1996 order-value distributions
    * over [[jsDivergence]]'s bins — the drift metric with a true metric
    * structure (triangle inequality) that PSI and JS lack:
    * H = √(1 − Σ√(pᵢqᵢ)). Per-bin √(c₁c₂/(n₁n₂)) quantizes ONCE to
    * nano (the products multiply as doubles — identical in both
    * engines), the Bhattacharyya sum is exact, one √ at the end. */
  val hellinger = QuerySpec(
    "q_hellinger",
    (s, d) => {
      val binned = orders(s, d)
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .select(year(col("o_orderdate")).as("yr"),
          least(floor(col("o_totalprice") / 30000.0), lit(19.0))
            .cast("long").as("bin"))
      val perBin = binned.groupBy("bin").agg(
        sum((col("yr") === 1995).cast("long")).as("c1"),
        sum((col("yr") === 1996).cast("long")).as("c2"))
      val tot = perBin.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      perBin.crossJoin(broadcast(tot))
        .select(expr("""CAST(round(sqrt((CAST(c1 AS DOUBLE)
                  * CAST(c2 AS DOUBLE))
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e9)
                AS BIGINT)""").as("bc_nano"))
        .agg(count(lit(1)).as("n_bins"), sum("bc_nano").as("bc"))
        .select(col("n_bins"),
          round(col("bc").cast("double") / 1e9, 6).as("bhattacharyya"),
          round(sqrt(greatest(lit(0.0),
            lit(1.0) - col("bc").cast("double") / 1e9)), 6).as("hellinger"))
    },
    Some("""
      WITH binned AS (
        SELECT year(CAST(o_orderdate AS DATE)) AS yr,
               CAST(least(floor(o_totalprice / 30000.0), 19.0) AS BIGINT)
                 AS bin
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
      ),
      per_bin AS (
        SELECT bin,
               CAST(sum(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM binned GROUP BY 1
      ),
      tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                     CAST(sum(c2) AS BIGINT) AS n2 FROM per_bin),
      terms AS (
        SELECT CAST(round(sqrt((CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e9)
               AS BIGINT) AS bc_nano
        FROM per_bin CROSS JOIN tot
      )
      SELECT CAST(count(*) AS BIGINT) AS n_bins,
             round(CAST(sum(bc_nano) AS DOUBLE) / 1e9, 6) AS bhattacharyya,
             round(sqrt(greatest(0.0,
               1.0 - CAST(sum(bc_nano) AS DOUBLE) / 1e9)), 6) AS hellinger
      FROM terms
    """))

  /** Theil's uncertainty coefficient U(returnflag | ship year) — the
    * NORMALIZED mutual information ([0, 1]) that answers "how much of
    * the return outcome does the era explain?" in units a dashboard can
    * threshold. Every cell/marginal count is exact; each cell's
    * ln(c·N/(c_x·c_y)) decomposes into four single-integer logs
    * (ln c + ln N − ln c_x − ln c_y — never a > 2⁵³ product) and
    * nano-quantizes once, so Σ c·nano is exact under any partition
    * order. U = I/H(Y), both reported in nats. */
  val theilU = QuerySpec(
    "q_theil_u",
    (s, d) => {
      val cells = lineitem(s, d)
        .groupBy(year(col("l_shipdate")).as("x"),
          col("l_returnflag").as("y"))
        .agg(count(lit(1)).as("c"))
      val mx = cells.groupBy("x").agg(sum("c").as("cx"))
      val my = cells.groupBy("y").agg(sum("c").as("cy"))
      val tot = cells.agg(sum("c").as("nn"))
      val terms = cells.join(mx, "x").join(my, "y")
        .crossJoin(broadcast(tot))
        .select(col("c"),
          expr("""CAST(round((ln(CAST(c AS DOUBLE)) + ln(CAST(nn AS DOUBLE))
                  - ln(CAST(cx AS DOUBLE)) - ln(CAST(cy AS DOUBLE))) * 1e9)
                AS BIGINT)""").as("nano"))
      val iSum = terms.agg(sum(col("c") * col("nano")).as("si"),
        sum("c").as("n"))
      val hy = my.crossJoin(broadcast(tot))
        .select(col("cy"),
          expr("""CAST(round((ln(CAST(cy AS DOUBLE)) - ln(CAST(nn AS DOUBLE)))
                  * 1e9) AS BIGINT)""").as("nano"))
        .agg(sum(col("cy") * col("nano")).as("sh"), sum("cy").as("nh"))
      iSum.crossJoin(broadcast(hy)).select(
        col("n").as("n_rows"),
        round(col("si").cast("double") / (col("n").cast("double") * 1e9), 6)
          .as("i_nats"),
        // +0.0 canonicalizes the IEEE zero sign: a one-class y gives
        // H(Y) = -0.0 here and the driver's hash is raw-bits-sensitive
        (round(-col("sh").cast("double") /
          (col("nh").cast("double") * 1e9), 6) + lit(0.0)).as("h_y"),
        // try_divide: one y class means H(Y) = 0 and U is NULL (DuckDB's
        // x/0), not an ANSI error (degen constant corpus)
        round(try_divide(
          col("si").cast("double") / (col("n").cast("double") * 1e9),
          -col("sh").cast("double") / (col("nh").cast("double") * 1e9)), 6)
          .as("theil_u"))
    },
    Some("""
      WITH cells AS (
        SELECT year(l_shipdate) AS x, l_returnflag AS y,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
      ),
      mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY x),
      my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY y),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells),
      terms AS (
        SELECT c, CAST(round((ln(CAST(c AS DOUBLE)) + ln(CAST(nn AS DOUBLE))
                 - ln(CAST(cx AS DOUBLE)) - ln(CAST(cy AS DOUBLE))) * 1e9)
               AS BIGINT) AS nano
        FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
      ),
      isum AS (SELECT CAST(sum(c * nano) AS BIGINT) AS si,
                      CAST(sum(c) AS BIGINT) AS n FROM terms),
      hy AS (
        SELECT CAST(sum(cy * nano) AS BIGINT) AS sh,
               CAST(sum(cy) AS BIGINT) AS nh
        FROM (SELECT cy, CAST(round((ln(CAST(cy AS DOUBLE))
                     - ln(CAST(nn AS DOUBLE))) * 1e9) AS BIGINT) AS nano
              FROM my CROSS JOIN tot)
      )
      SELECT n AS n_rows,
             round(CAST(si AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9), 6)
               AS i_nats,
             round(-CAST(sh AS DOUBLE) / (CAST(nh AS DOUBLE) * 1e9), 6)
               + 0.0 AS h_y,
             round((CAST(si AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9))
                   / (-CAST(sh AS DOUBLE) / (CAST(nh AS DOUBLE) * 1e9)), 6)
               AS theil_u
      FROM isum CROSS JOIN hy
    """))

  /** Cramér–von Mises-type discrepancy between the 1995/1996 order-value
    * distributions: D = Σᵥ (c₁+c₂)/(n₁+n₂) · (F₁(v)−F₂(v))² — the
    * squared-CDF-gap integral under the pooled law, the L² companion to
    * q_ks_test's sup-norm. CDFs accumulate over the distinct-$100-value
    * frame via [[graft.ops.Ranks.globalCumsum]]'s cutpoint buckets (r12:
    * the value frame is distinct-value-proportional — it grows with the
    * price domain, so the former unpartitioned cumsum window was a
    * single-task funnel; the running sums are exact longs, so the
    * distributed prefix is bit-identical); each bin's term is a fixed
    * double tree on exact integers, nano-quantized once so the cross-bin
    * sum is exact. */
  val cvm = QuerySpec(
    "q_cvm",
    (s, d) => {
      val binned = orders(s, d)
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .select(year(col("o_orderdate")).as("yr"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) " +
            "DIV 10000").as("v"))
      // materialized once: feeds the cutpoint sample, the bucket pass,
      // and the totals row
      val perV = graft.ops.Checkpoints.materialize(
        binned.groupBy("v").agg(
          sum((col("yr") === 1995).cast("long")).as("c1"),
          sum((col("yr") === 1996).cast("long")).as("c2")))
      val nParts = s.sessionState.conf.numShufflePartitions
      val cum = graft.ops.Ranks.globalCumsum(perV, Seq(col("v")), nParts,
        Seq("k1" -> "c1", "k2" -> "c2"))
      val tot = perV.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      val terms = cum.crossJoin(broadcast(tot))
        .select(expr("""CAST(round((CAST(c1 + c2 AS DOUBLE)
                  / CAST(n1 + n2 AS DOUBLE))
                  * (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                  * (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)) * 1e9)
                AS BIGINT)""").as("t_nano"),
          col("n1"), col("n2"))
      terms.agg(max("n1").as("n1"), max("n2").as("n2"),
          sum("t_nano").as("st"))
        .select(col("n1"), col("n2"),
          round(col("st").cast("double") / 1e9, 6).as("cvm_d"))
    },
    Some("""
      WITH binned AS (
        SELECT year(CAST(o_orderdate AS DATE)) AS yr,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 // 10000 AS v
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
      ),
      per_v AS (
        SELECT v,
               CAST(sum(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM binned GROUP BY v
      ),
      cum AS (
        SELECT v, c1, c2,
               sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS k1,
               sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS k2
        FROM per_v
      ),
      tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                     CAST(sum(c2) AS BIGINT) AS n2 FROM per_v),
      terms AS (
        SELECT CAST(round((CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                 * (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)) * 1e9)
               AS BIGINT) AS t_nano,
               n1, n2
        FROM cum CROSS JOIN tot
      )
      SELECT max(n1) AS n1, max(n2) AS n2,
             round(CAST(sum(t_nano) AS DOUBLE) / 1e9, 6) AS cvm_d
      FROM terms
    """))

  /** Weibull AFT fit of the inter-order gap distribution by the classic
    * probability plot: OLS of ln(−ln S(t)) on ln t over the
    * Kaplan–Meier event points (0 < S < 1, t ≥ 1) — slope = shape k,
    * scale λ = exp(−intercept/k); k < 1 reads "reorder hazard falls with
    * time since last order". The KM fold is the portable q_kaplan_meier
    * machinery (ordered windowed product — identical double sequence in
    * both engines); both transcendental transforms quantize ONCE to
    * nano-units so the OLS sufficient statistics are exact DECIMAL
    * integers (the q_zipf_slope discipline). */
  /** The inter-order gap frame shared by [[weibullFit]] and [[ksGof]]:
    * (dur days, event flag) per order, censored at the horizon. */
  private def gapFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val horizon = orders(s, d)
      .agg(max(to_date(col("o_orderdate"))).as("hz"))
    orders(s, d)
      .withColumn("nxt", lead(to_date(col("o_orderdate")), 1).over(w))
      .crossJoin(broadcast(horizon))
      .select(
        when(col("nxt").isNotNull,
          datediff(col("nxt"), to_date(col("o_orderdate"))))
          .otherwise(datediff(col("hz"), to_date(col("o_orderdate"))))
          .as("dur"),
        col("nxt").isNotNull.cast("int").as("event"))
  }

  /** One-row (n_points, shape, scale_days) Weibull plot fit over
    * [[gapFrame]] — shape/scale ROUNDED at 1e-6, so downstream
    * composition ([[ksGof]]) sees bit-identical parameters in both
    * engines. */
  private def weibullParams(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    // materialize the gap frame: kaplanMeier consumes its input TWICE
    // (per-t counts + the risk-set total), and the gap frame is a full
    // window pass over orders — uncheckpointed, the plan re-ran that
    // window per consumer (r11 optimization: 2 evaluations → 1 here,
    // 4 → 1 in q_ks_gof; values are materialization-invariant)
    weibullParamsFrom(graft.ops.Checkpoints.materialize(gapFrame(s, d)))

  /** [[weibullParams]] over an ALREADY-built (dur, event) frame — the
    * composition entry [[ksGof]] uses so its own cumulative-F̂ branch and
    * the fit share ONE materialized gap frame. */
  private def weibullParamsFrom(
      gf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pts = graft.ops.Series.kaplanMeier(gf, "dur", "event")
      .filter(col("t") >= 1 && col("surv") > 0.0 && col("surv") < 1.0)
      .select(
        expr("CAST(round(ln(CAST(t AS DOUBLE)) * 1e9) AS BIGINT)").as("x"),
        expr("CAST(round(ln(-ln(surv)) * 1e9) AS BIGINT)").as("y"))
    val st = pts.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d38)).cast("double").as("sx"),
      sum(col("y").cast(d38)).cast("double").as("sy"),
      sum(col("x").cast(d38) * col("x")).cast("double").as("sxx"),
      sum(col("x").cast(d38) * col("y")).cast("double").as("sxy"))
    val k = (col("n").cast("double") * col("sxy") -
      col("sx") * col("sy")) /
      (col("n").cast("double") * col("sxx") - col("sx") * col("sx"))
    val intercept = (col("sy") - k * col("sx")) /
      (col("n").cast("double") * 1e9)
    st.select(col("n").as("n_points"),
      round(k, 6).as("shape"),
      round(exp(-intercept / k), 6).as("scale_days"))
  }

  /** The matching DuckDB CTE chain, ending in `fit(n_points, shape,
    * scale_days)` — kept textually in lockstep with [[weibullParams]]
    * (one definition per engine pair, the dsir-CTE precedent). */
  private val WeibullFitSql = """
      hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders),
      seq AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt,
               lead(CAST(o_orderdate AS DATE))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS nxt
        FROM orders
      ),
      dur AS (
        -- the kaplanMeier NULL-duration exclusion (hollow DegenGate)
        SELECT CAST(CASE WHEN nxt IS NOT NULL THEN nxt - dt
                         ELSE h - dt END AS BIGINT) AS t,
               CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM seq, hz
        WHERE (CASE WHEN nxt IS NOT NULL THEN nxt - dt
                    ELSE h - dt END) IS NOT NULL
      ),
      byt AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
                     CAST(count(*) AS BIGINT) AS c
              FROM dur GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dur),
      risk AS (
        SELECT t, d, c,
               CAST(n - sum(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) + c
                    AS BIGINT) AS n_risk
        FROM byt, tot
      ),
      evf AS (
        SELECT t, CAST(1.0 AS DOUBLE)
                 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
        FROM risk WHERE d > 0
      ),
      km AS (
        SELECT t, list_reduce(list(f) OVER (ORDER BY t ROWS UNBOUNDED
                 PRECEDING), (a, b) -> a * b) AS surv
        FROM evf
      ),
      wpts AS (
        SELECT CAST(round(ln(CAST(t AS DOUBLE)) * 1e9) AS BIGINT) AS x,
               CAST(round(ln(-ln(surv)) * 1e9) AS BIGINT) AS y
        FROM km WHERE t >= 1 AND surv > 0.0 AND surv < 1.0
      ),
      wst AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
        FROM wpts
      ),
      fit AS (
        SELECT n AS n_points,
               round((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS shape,
               round(exp(-((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                       / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                      / (CAST(n AS DOUBLE) * 1e9))
                     / ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx))), 6)
                 AS scale_days
        FROM wst
      )"""

  val weibullFit = QuerySpec(
    "q_weibull_fit",
    (s, d) => weibullParams(s, d),
    Some(s"""
      WITH $WeibullFitSql
      SELECT n_points, shape, scale_days FROM fit
    """))

  /** Stratified treatment-effect estimate (the poor-economist's
    * propensity adjustment): does a deep discount (> 0.05) associate
    * with higher line revenue AFTER blocking by order quantity (the
    * obvious confounder — big orders get big discounts AND big
    * revenue)? ATT = Σ_s (n_{t,s}/n_t)(ȳ_{t,s} − ȳ_{c,s}) over five
    * fixed quantity decile-of-50 strata, pivoted in order; the naive
    * unadjusted difference ships alongside so the confounding
    * correction is visible. Cents sums exact DECIMAL; one double tree. */
  val propensityStrata = QuerySpec(
    "q_propensity_strata",
    (s, d) => {
      val rows = lineitem(s, d).select(
        // when/otherwise, not a bool cast: a NULL discount is NOT a deep
        // discount — the oracle's CASE lands in ELSE 0, a NULL treatment
        // flag would drop the row from BOTH arms (hollow DegenGate)
        when(col("l_discount") > 0.05, 1).otherwise(0).as("tr"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("y"),
        least(floor((col("l_quantity") - 1) / 10.0), lit(4.0)).cast("int")
          .as("st"))
      val aggs = (0 to 4).flatMap { g => Seq(
        sum(when(col("st") === g && col("tr") === 1, 1L).otherwise(0L))
          .as(s"nt$g"),
        sum(when(col("st") === g && col("tr") === 1, col("y").cast(d38))
          .otherwise(lit(0).cast(d38))).as(s"st$g"),
        sum(when(col("st") === g && col("tr") === 0, 1L).otherwise(0L))
          .as(s"nc$g"),
        sum(when(col("st") === g && col("tr") === 0, col("y").cast(d38))
          .otherwise(lit(0).cast(d38))).as(s"sc$g"))
      }
      val piv = rows.agg(aggs.head, aggs.tail: _*)
      val nT = (0 to 4).map(g => col(s"nt$g")).reduce(_ + _).cast("double")
      val att = (0 to 4).map { g =>
        when(col(s"nt$g") > 0 && col(s"nc$g") > 0,
          (col(s"nt$g").cast("double") / nT) *
            (col(s"st$g").cast("double") / col(s"nt$g").cast("double") -
              col(s"sc$g").cast("double") / col(s"nc$g").cast("double")))
          .otherwise(lit(0.0))
      }.reduce(_ + _)
      val sT = (0 to 4).map(g => col(s"st$g")).reduce(_ + _).cast("double")
      val nC = (0 to 4).map(g => col(s"nc$g")).reduce(_ + _).cast("double")
      val sC = (0 to 4).map(g => col(s"sc$g")).reduce(_ + _).cast("double")
      // try_divide: a corpus with no treated (or no control) rows has no
      // naive difference — NULL (DuckDB's x/0), not an ANSI error
      val naive = try_divide(sT, nT) - try_divide(sC, nC)
      piv.select(nT.cast("long").as("n_treated"),
        nC.cast("long").as("n_control"),
        round(att / 100.0, 6).as("att_usd"),
        round(naive / 100.0, 6).as("naive_diff_usd"))
    },
    Some {
      val aggs = (0 to 4).map { g =>
        s"""CAST(sum(CASE WHEN st = $g AND tr = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt$g,
            CAST(sum(CASE WHEN st = $g AND tr = 1 THEN CAST(y AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS st$g,
            CAST(sum(CASE WHEN st = $g AND tr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc$g,
            CAST(sum(CASE WHEN st = $g AND tr = 0 THEN CAST(y AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS sc$g"""
      }.mkString(",")
      val nT = (0 to 4).map(g => s"nt$g").mkString(" + ")
      val att = (0 to 4).map { g =>
        s"""CASE WHEN nt$g > 0 AND nc$g > 0 THEN
              (CAST(nt$g AS DOUBLE) / CAST($nT AS DOUBLE))
              * (CAST(st$g AS DOUBLE) / CAST(nt$g AS DOUBLE)
                 - CAST(sc$g AS DOUBLE) / CAST(nc$g AS DOUBLE))
            ELSE 0.0 END"""
      }.mkString(" + ")
      val sT = (0 to 4).map(g => s"st$g").mkString(" + ")
      val nC = (0 to 4).map(g => s"nc$g").mkString(" + ")
      val sC = (0 to 4).map(g => s"sc$g").mkString(" + ")
      s"""
      WITH rows_ AS (
        SELECT CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS tr,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS y,
               CAST(least(floor((l_quantity - 1) / 10.0), 4.0) AS INTEGER)
                 AS st
        FROM lineitem
      ),
      piv AS (SELECT $aggs FROM rows_)
      SELECT CAST($nT AS BIGINT) AS n_treated,
             CAST($nC AS BIGINT) AS n_control,
             round(($att) / 100.0, 6) AS att_usd,
             round((CAST($sT AS DOUBLE) / CAST($nT AS DOUBLE)
                    - CAST($sC AS DOUBLE) / CAST($nC AS DOUBLE)) / 100.0, 6)
               AS naive_diff_usd
      FROM piv
      """
    })

  /** Sample L-moments of daily revenue — the order-statistics moment
    * family that is robust where classical skew/kurtosis explode (every
    * estimator is LINEAR in the data): L-CV, L-skewness t₃, L-kurtosis
    * t₄ via the probability-weighted moments b₀…b₃. Ranks come from one
    * window over the calendar-bounded daily frame (ties broken by day —
    * total order); each bᵣ numerator Σ(i−1)(i−2)…x_i is an exact
    * DECIMAL(38,0) integer; the λ combinations and ratios are one double
    * tree. Reference bands: exponential t₃ = 1/3, normal t₃ = 0,
    * normal t₄ ≈ 0.1226. */
  val lMoments = QuerySpec(
    "q_l_moments",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val daily = orders(s, d)
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("t"))
        .agg(sum(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("v"))
      val ranked = daily
        .withColumn("i", row_number().over(W.orderBy("v", "t"))
          .cast("long"))
      val st = ranked.agg(
        count(lit(1)).as("n"),
        sum(col("v").cast(d38)).as("b0n"),
        sum((col("i") - 1).cast(d38) * col("v")).as("b1n"),
        sum(((col("i") - 1) * (col("i") - 2)).cast(d38) * col("v"))
          .as("b2n"),
        sum(((col("i") - 1) * (col("i") - 2)).cast(d38) * (col("i") - 3) *
          col("v")).as("b3n"))
      val n = col("n").cast("double")
      // try_divide: fewer than 4 days (degen corpora) zero these
      // factorials — the higher L-moments are NULL, not ANSI errors
      val b0 = try_divide(col("b0n").cast("double"), n)
      val b1 = try_divide(col("b1n").cast("double"), n * (n - 1.0))
      val b2 = try_divide(col("b2n").cast("double"),
        n * (n - 1.0) * (n - 2.0))
      val b3 = try_divide(col("b3n").cast("double"),
        n * (n - 1.0) * (n - 2.0) * (n - 3.0))
      val l1 = b0
      val l2 = lit(2.0) * b1 - b0
      val l3 = lit(6.0) * b2 - lit(6.0) * b1 + b0
      val l4 = lit(20.0) * b3 - lit(30.0) * b2 + lit(12.0) * b1 - b0
      st.select(col("n").as("n_days"),
        round(l1 / 100.0, 2).as("l1_usd"),
        round(l2 / 100.0, 2).as("l2_usd"),
        round(try_divide(l2, l1), 6).as("l_cv"),
        round(try_divide(l3, l2), 6).as("t3_lskew"),
        round(try_divide(l4, l2), 6).as("t4_lkurt"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS t,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS v
        FROM orders GROUP BY 1
      ),
      ranked AS (
        SELECT v, CAST(row_number() OVER (ORDER BY v, t) AS BIGINT) AS i
        FROM daily
      ),
      st AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS b0n,
               CAST(sum(CAST(i - 1 AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))
                 AS b1n,
               CAST(sum(CAST((i - 1) * (i - 2) AS DECIMAL(38,0)) * v)
                 AS DECIMAL(38,0)) AS b2n,
               CAST(sum(CAST((i - 1) * (i - 2) AS DECIMAL(38,0)) * (i - 3)
                 * v) AS DECIMAL(38,0)) AS b3n
        FROM ranked
      ),
      lm AS (
        SELECT n,
               CAST(b0n AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
               CAST(b1n AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS b1,
               CAST(b2n AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                    * (CAST(n AS DOUBLE) - 2.0)) AS b2,
               CAST(b3n AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                    * (CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0))
                 AS b3
        FROM st
      )
      SELECT n AS n_days,
             round(b0 / 100.0, 2) AS l1_usd,
             round((2.0 * b1 - b0) / 100.0, 2) AS l2_usd,
             round((2.0 * b1 - b0) / b0, 6) AS l_cv,
             round((6.0 * b2 - 6.0 * b1 + b0) / (2.0 * b1 - b0), 6)
               AS t3_lskew,
             round((20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0)
                   / (2.0 * b1 - b0), 6) AS t4_lkurt
      FROM lm
    """))

  /** Exact Shapley attribution of regression R² across the two-feature
    * model extendedprice ~ (quantity, discount) — closed-form XAI: with
    * two players the Shapley value needs only the single- and
    * two-feature R²s, all of which reduce to the 1e-6-rounded pairwise
    * correlations ([[vif]]'s composition discipline):
    * φ_q = ½r_qy² + ½(R²_full − r_dy²), φ_d symmetric, φ_q + φ_d =
    * R²_full by construction (spec-asserted). */
  val shapleyR2 = QuerySpec(
    "q_shapley_r2",
    (s, d) => {
      def dsum(c: Column) = sum(c.cast("decimal(38,18)")).cast("double")
      val (q, dc, y) = (col("l_quantity"), col("l_discount"),
        col("l_extendedprice"))
      // try_divide: one sample (degenerate corpora) has zero variance and
      // the correlation is NULL (DuckDB's x/0), not an ANSI error
      def corrOf(sx: String, sy: String, sxy: String, sxx: String,
          syy: String) = round(
        try_divide(col("n") * col(sxy) - col(sx) * col(sy),
          // greatest(…, 0): the sufficient statistics pass through DOUBLE,
          // so an exactly-zero variance (constant column) can round to a
          // TINY NEGATIVE — sqrt would be NaN here and an ERROR in DuckDB
          sqrt(greatest(col("n") * col(sxx) - col(sx) * col(sx),
            lit(0.0))) *
            sqrt(greatest(col("n") * col(syy) - col(sy) * col(sy),
              lit(0.0)))), 6)
      val rs = lineitem(s, d)
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(q).as("sq"), dsum(dc).as("sd"), dsum(y).as("sy"),
          dsum(q * q).as("sqq"), dsum(dc * dc).as("sdd"),
          dsum(y * y).as("syy"),
          dsum(q * dc).as("sqd"), dsum(q * y).as("sqy"),
          dsum(dc * y).as("sdy"))
        .select(
          corrOf("sq", "sy", "sqy", "sqq", "syy").as("r_qy"),
          corrOf("sd", "sy", "sdy", "sdd", "syy").as("r_dy"),
          corrOf("sq", "sd", "sqd", "sqq", "sdd").as("r_qd"))
      // try_divide: perfectly collinear features (|r_qd| = 1 on degenerate
      // corpora) make the partition undefined — NULL, not an ANSI error
      val r2Full = try_divide(
        col("r_qy") * col("r_qy") + col("r_dy") * col("r_dy") -
          lit(2.0) * col("r_qy") * col("r_dy") * col("r_qd"),
        lit(1.0) - col("r_qd") * col("r_qd"))
      val phiQ = lit(0.5) * col("r_qy") * col("r_qy") +
        lit(0.5) * (r2Full - col("r_dy") * col("r_dy"))
      val phiD = lit(0.5) * col("r_dy") * col("r_dy") +
        lit(0.5) * (r2Full - col("r_qy") * col("r_qy"))
      rs.select(round(r2Full, 6).as("r2_full"),
        round(phiQ, 6).as("phi_qty"), round(phiD, 6).as("phi_disc"))
    },
    Some("""
      WITH st AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,18))) AS DOUBLE) AS sq,
               CAST(sum(CAST(l_discount AS DECIMAL(38,18))) AS DOUBLE) AS sd,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,18))) AS DOUBLE) AS sy,
               CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,18))) AS DOUBLE) AS sqq,
               CAST(sum(CAST(l_discount * l_discount AS DECIMAL(38,18))) AS DOUBLE) AS sdd,
               CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,18))) AS DOUBLE) AS syy,
               CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(38,18))) AS DOUBLE) AS sqd,
               CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,18))) AS DOUBLE) AS sqy,
               CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(38,18))) AS DOUBLE) AS sdy
        FROM lineitem
      ),
      rs AS (
        SELECT round((n * sqy - sq * sy) / (sqrt(greatest(n * sqq - sq * sq, 0))
                 * sqrt(greatest(n * syy - sy * sy, 0))), 6) AS r_qy,
               round((n * sdy - sd * sy) / (sqrt(greatest(n * sdd - sd * sd, 0))
                 * sqrt(greatest(n * syy - sy * sy, 0))), 6) AS r_dy,
               round((n * sqd - sq * sd) / (sqrt(greatest(n * sqq - sq * sq, 0))
                 * sqrt(greatest(n * sdd - sd * sd, 0))), 6) AS r_qd
        FROM st
      ),
      ff AS (
        SELECT r_qy, r_dy, r_qd,
               (r_qy * r_qy + r_dy * r_dy - 2.0 * r_qy * r_dy * r_qd)
               / (1.0 - r_qd * r_qd) AS r2f
        FROM rs
      )
      SELECT round(r2f, 6) AS r2_full,
             round(0.5 * r_qy * r_qy + 0.5 * (r2f - r_dy * r_dy), 6)
               AS phi_qty,
             round(0.5 * r_dy * r_dy + 0.5 * (r2f - r_qy * r_qy), 6)
               AS phi_disc
      FROM ff
    """))

  /** Sample-ratio-mismatch guardrail over the engine's own md5
    * train/valid/test split (q_hash_split): χ² goodness-of-fit of the
    * observed bucket counts against the DESIGNED 204/26/26-of-256 hex
    * thresholds, computed cross-multiplied so every operand is an exact
    * integer: χ² = Σ (256·Oᵢ − kᵢ·n)² / (256·kᵢ·n). At production n an
    * SRM alarm on a derandomized split means data loss between stages;
    * at small n it fires at its designed .05 rate (the sf0.001 sample
    * happens to sit at χ² ≈ 6.5 — a genuine type-I illustration the
    * spec pins as flag/statistic consistency). Verdict χ²₍₂,.05₎. */
  val abSrm = QuerySpec(
    "q_ab_srm",
    (s, d) => {
      val rows = documents(s, d)
        .withColumn("split", graft.ops.Router.hashSplit(col("doc_id")))
      val piv = rows.agg(
        count(lit(1)).as("n"),
        sum((col("split") === "train").cast("long")).as("o_train"),
        sum((col("split") === "valid").cast("long")).as("o_valid"),
        sum((col("split") === "test").cast("long")).as("o_test"))
      def term(o: String, k: Int): Column = {
        val dev = col(o).cast("double") * 256.0 -
          lit(k.toDouble) * col("n").cast("double")
        dev * dev / (lit(256.0) * lit(k.toDouble) * col("n").cast("double"))
      }
      val chi2 = term("o_train", 204) + term("o_valid", 26) +
        term("o_test", 26)
      piv.select(col("n").as("n_docs"), col("o_train"), col("o_valid"),
        col("o_test"), round(chi2, 6).as("chi2_srm"),
        (round(chi2, 6) > 5.9915).cast("int").as("srm_alarm"))
    },
    Some("""
      WITH rows_ AS (
        SELECT CASE WHEN substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                      THEN 'train'
                    WHEN substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                      THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
      ),
      piv AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS o_train,
               CAST(sum(CASE WHEN split = 'valid' THEN 1 ELSE 0 END) AS BIGINT) AS o_valid,
               CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS o_test
        FROM rows_
      ),
      ff AS (
        SELECT n, o_train, o_valid, o_test,
               (CAST(o_train AS DOUBLE) * 256.0 - 204.0 * CAST(n AS DOUBLE))
               * (CAST(o_train AS DOUBLE) * 256.0 - 204.0 * CAST(n AS DOUBLE))
               / (256.0 * 204.0 * CAST(n AS DOUBLE))
               + (CAST(o_valid AS DOUBLE) * 256.0 - 26.0 * CAST(n AS DOUBLE))
               * (CAST(o_valid AS DOUBLE) * 256.0 - 26.0 * CAST(n AS DOUBLE))
               / (256.0 * 26.0 * CAST(n AS DOUBLE))
               + (CAST(o_test AS DOUBLE) * 256.0 - 26.0 * CAST(n AS DOUBLE))
               * (CAST(o_test AS DOUBLE) * 256.0 - 26.0 * CAST(n AS DOUBLE))
               / (256.0 * 26.0 * CAST(n AS DOUBLE)) AS chi2
        FROM piv
      )
      SELECT n AS n_docs, o_train, o_valid, o_test,
             round(chi2, 6) AS chi2_srm,
             CAST(round(chi2, 6) > 5.9915 AS INTEGER) AS srm_alarm
      FROM ff
    """))

  /** Kolmogorov–Smirnov goodness-of-fit of the UNCENSORED inter-order
    * gaps against the Weibull just fitted on them ([[weibullParams]],
    * shape/scale pinned at 1e-6): D = max_t |F̂(t) − F_w(t)| with
    * F_w(t) = 1 − exp(−exp(k·ln(t/λ))) spelled as the explicit exp∘ln
    * composition so both engines evaluate the same libm chain. F̂ is an
    * exact cumulative fraction over the bounded gap-value frame; each
    * gap is a fixed double tree nano-quantized before the max, argmax
    * ties to the earliest t. The model-on-its-own-training-data caveat
    * is the point: this D is the FIT diagnostic, not a test with
    * honest critical values. */
  val ksGof = QuerySpec(
    "q_ks_gof",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      // ONE materialized gap frame feeds both the F̂ branch (consumed
      // twice: per-t counts + total) and the Weibull fit's KM chain
      // (consumed twice more) — previously the orders window re-ran 4×
      // (r11 optimization; 44 → 22 Exchanges, values unchanged)
      val gf = graft.ops.Checkpoints.materialize(gapFrame(s, d))
      val gaps = gf.filter(col("event") === 1 && col("dur") >= 1)
        .groupBy(col("dur").cast("long").as("t"))
        .agg(count(lit(1)).as("c"))
      val tot = gaps.agg(sum("c").as("n"))
      val cum = gaps
        .withColumn("k", sum("c").over(
          W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)))
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(weibullParamsFrom(gf)
          .select(col("shape"), col("scale_days"))))
        .withColumn("gap_nano", expr(
          """CAST(round(abs(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
               - (1.0 - exp(-exp(shape * (ln(CAST(t AS DOUBLE))
                  - ln(scale_days)))))) * 1e9) AS BIGINT)"""))
      cum.orderBy(col("gap_nano").desc, col("t")).limit(1)
        .select(col("n").as("n_gaps"), col("t").cast("int").as("at_t_days"),
          round(col("gap_nano").cast("double") / 1e9, 6).as("ks_d"))
    },
    Some(s"""
      WITH $WeibullFitSql,
      gaps AS (
        SELECT t, CAST(count(*) AS BIGINT) AS c
        FROM dur WHERE ev = 1 AND t >= 1
        GROUP BY t
      ),
      gtot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM gaps),
      cum AS (
        SELECT t,
               CAST(sum(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS k,
               n, shape, scale_days
        FROM gaps CROSS JOIN gtot CROSS JOIN fit
      ),
      gapped AS (
        SELECT t, n,
               CAST(round(abs(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                 - (1.0 - exp(-exp(shape * (ln(CAST(t AS DOUBLE))
                    - ln(scale_days)))))) * 1e9) AS BIGINT) AS gap_nano
        FROM cum
      )
      SELECT n AS n_gaps, CAST(t AS INTEGER) AS at_t_days,
             round(CAST(gap_nano AS DOUBLE) / 1e9, 6) AS ks_d
      FROM gapped
      ORDER BY gap_nano DESC, t
      LIMIT 1
    """))

  /** Partial-dependence profile of the pinned returns model
    * ([[hosmerLemeshow]]'s score = −1.2 + 8·discount − 0.02·quantity)
    * along the discount axis: for each of the 11 designed discount
    * levels, the corpus-average p̂ with discount FORCED to that level
    * (marginalizing over the empirical quantity distribution — the PDP
    * definition). One scan: the 11 forced scores are fixed expressions
    * of quantity alone, each nano-quantized per row, so the means are
    * exact. The observed response rate per ACTUAL discount level rides
    * along — the PDP-vs-raw-slice contrast IS the confounding story. */
  val pdp = QuerySpec(
    "q_pdp",
    (s, d) => {
      val grid = (0 to 10).map(_ / 100.0)
      val rows = lineitem(s, d).select(col("l_quantity").as("q"),
        expr("CAST(round(l_discount * 100) AS INT)").as("dc"),
        (col("l_returnflag") === "R").cast("long").as("y"))
      val aggs =
        count(lit(1)).as("n") +:
          (grid.zipWithIndex.map { case (g, i) =>
            sum(expr(
              s"""CAST(round(1e9 / (1.0 + exp(-(-1.2 + 8.0 * $g
                   - 0.02 * q)))) AS BIGINT)""")).as(s"pd$i")
          } ++ (0 to 10).flatMap { i => Seq(
            sum(when(col("dc") === i, 1L).otherwise(0L)).as(s"cn$i"),
            sum(when(col("dc") === i, col("y")).otherwise(0L)).as(s"cy$i"))
          })
      val piv = rows.agg(aggs.head, aggs.tail: _*)
      val out = (0 to 10).map { i =>
        struct(lit(i).as("disc_pct"),
          round(col(s"pd$i").cast("double") /
            (col("n").cast("double") * 1e9), 6).as("pdp_phat"),
          col(s"cn$i").as("n_at_level"),
          when(col(s"cn$i") > 0, round(col(s"cy$i").cast("double") /
            col(s"cn$i").cast("double"), 6)).otherwise(lit(0.0))
            .as("raw_rate"))
      }
      piv.select(explode(array(out: _*)).as("r"))
        .select(col("r.disc_pct"), col("r.pdp_phat"), col("r.n_at_level"),
          col("r.raw_rate"))
        .orderBy("disc_pct")
    },
    Some {
      val rows = (0 to 10).map { i =>
        val g = i / 100.0
        s"""SELECT $i AS disc_pct,
              round(CAST(sum(CAST(round(1e9 / (1.0 + exp(-(-1.2 + 8.0 * $g
                    - 0.02 * l_quantity)))) AS BIGINT)) AS DOUBLE)
                / (CAST(count(*) AS DOUBLE) * 1e9), 6) AS pdp_phat,
              CAST(sum(CASE WHEN CAST(round(l_discount * 100) AS INTEGER) = $i
                THEN 1 ELSE 0 END) AS BIGINT) AS n_at_level,
              CASE WHEN sum(CASE WHEN CAST(round(l_discount * 100) AS INTEGER) = $i
                     THEN 1 ELSE 0 END) > 0
                THEN round(CAST(sum(CASE WHEN CAST(round(l_discount * 100)
                       AS INTEGER) = $i AND l_returnflag = 'R' THEN 1 ELSE 0
                       END) AS DOUBLE)
                     / CAST(sum(CASE WHEN CAST(round(l_discount * 100)
                       AS INTEGER) = $i THEN 1 ELSE 0 END) AS DOUBLE), 6)
                ELSE 0.0 END AS raw_rate
            FROM lineitem"""
      }.mkString("\nUNION ALL\n")
      s"""
      SELECT * FROM ($rows)
      ORDER BY disc_pct
      """
    })

  /** Simpson's-paradox detector on the discount→returns relationship:
    * does the POOLED 2×2 odds ratio disagree in direction with the
    * year-stratified Mantel–Haenszel OR ([[mantelHaenszel]]'s exact
    * machinery, one extra fixed tree for the pooled table)? The flag is
    * an integer comparison of both ORs against 1 on their 1e-6-rounded
    * values — the audit a metrics platform runs before anyone ships a
    * "discounts cause returns" headline. */
  val simpsonsCheck = QuerySpec(
    "q_simpsons_check",
    (s, d) => {
      val rows = lineitem(s, d).select(
        year(col("l_shipdate")).as("y"),
        (col("l_discount") > 0.05).cast("int").as("e"),
        (col("l_returnflag") === "R").cast("int").as("r"))
      val aggs = (shipYears.zipWithIndex.flatMap { case (yv, i) => Seq(
        sum(when(col("y") === yv && col("e") === 1 && col("r") === 1, 1L)
          .otherwise(0L)).as(s"a$i"),
        sum(when(col("y") === yv && col("e") === 1 && col("r") === 0, 1L)
          .otherwise(0L)).as(s"b$i"),
        sum(when(col("y") === yv && col("e") === 0 && col("r") === 1, 1L)
          .otherwise(0L)).as(s"c$i"),
        sum(when(col("y") === yv && col("e") === 0 && col("r") === 0, 1L)
          .otherwise(0L)).as(s"d$i"))
      }) ++ Seq(
        sum(when(col("e") === 1 && col("r") === 1, 1L).otherwise(0L))
          .as("pa"),
        sum(when(col("e") === 1 && col("r") === 0, 1L).otherwise(0L))
          .as("pb"),
        sum(when(col("e") === 0 && col("r") === 1, 1L).otherwise(0L))
          .as("pc"),
        sum(when(col("e") === 0 && col("r") === 0, 1L).otherwise(0L))
          .as("pd"))
      val piv = rows.agg(aggs.head, aggs.tail: _*)
      def dbl(e: String): Column = expr(e).cast("double")
      // try_divide throughout: empty strata / empty cells on degenerate
      // corpora make the odds ratios NULL (DuckDB's x/0), not ANSI errors
      val parts = shipYears.indices.map { i =>
        val n = dbl(s"a$i + b$i + c$i + d$i")
        (try_divide(dbl(s"a$i") * dbl(s"d$i"), n),
          try_divide(dbl(s"b$i") * dbl(s"c$i"), n))
      }
      val orMh = round(try_divide(parts.map(_._1).reduce(_ + _),
        parts.map(_._2).reduce(_ + _)), 6)
      val orPooled = round(try_divide(dbl("pa") * dbl("pd"),
        dbl("pb") * dbl("pc")), 6)
      piv.select(orPooled.as("or_pooled"), orMh.as("or_mh"),
        ((orPooled > 1.0 && orMh < 1.0) ||
          (orPooled < 1.0 && orMh > 1.0)).cast("int").as("paradox_flag"))
    },
    Some {
      val strata = shipYears.indices.map { i =>
        val y = shipYears(i)
        s"""CAST(sum(CASE WHEN y = $y AND e = 1 AND r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a$i,
            CAST(sum(CASE WHEN y = $y AND e = 1 AND r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b$i,
            CAST(sum(CASE WHEN y = $y AND e = 0 AND r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c$i,
            CAST(sum(CASE WHEN y = $y AND e = 0 AND r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d$i"""
      }.mkString(",")
      def nD(i: Int) = s"CAST(a$i + b$i + c$i + d$i AS DOUBLE)"
      val rSum = shipYears.indices.map(i =>
        s"CAST(a$i AS DOUBLE) * CAST(d$i AS DOUBLE) / ${nD(i)}")
        .mkString(" + ")
      val sSum = shipYears.indices.map(i =>
        s"CAST(b$i AS DOUBLE) * CAST(c$i AS DOUBLE) / ${nD(i)}")
        .mkString(" + ")
      s"""
      WITH rows_ AS (
        SELECT year(l_shipdate) AS y,
               CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS e,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        FROM lineitem
      ),
      piv AS (
        SELECT $strata,
               CAST(sum(CASE WHEN e = 1 AND r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pa,
               CAST(sum(CASE WHEN e = 1 AND r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pb,
               CAST(sum(CASE WHEN e = 0 AND r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pc,
               CAST(sum(CASE WHEN e = 0 AND r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pd
        FROM rows_
      ),
      ors AS (
        SELECT round(CAST(pa AS DOUBLE) * CAST(pd AS DOUBLE)
                     / (CAST(pb AS DOUBLE) * CAST(pc AS DOUBLE)), 6)
                 AS or_pooled,
               round(($rSum) / ($sSum), 6) AS or_mh
        FROM piv
      )
      SELECT or_pooled, or_mh,
             CAST((or_pooled > 1.0 AND or_mh < 1.0)
                  OR (or_pooled < 1.0 AND or_mh > 1.0) AS INTEGER)
               AS paradox_flag
      FROM ors
      """
    })

  /** Bland–Altman agreement between the line's billed amount and its
    * list-price expectation (quantity × p_retailprice): bias and 95%
    * limits of agreement on the per-line difference in cents — the
    * method-comparison statistic that catches systematic pricing skew a
    * correlation can't (two highly correlated measures can still
    * disagree by a constant). Differences are exact integers; bias and
    * LoA are one double tree over DECIMAL sufficient statistics. */
  val blandAltman = QuerySpec(
    "q_bland_altman",
    (s, d) => {
      val rows = lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .select(expr(
          """CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             - CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          """).as("diff"))
      val st = rows.agg(count(lit(1)).as("n"),
        sum(col("diff").cast(d38)).as("sd"),
        sum(col("diff").cast(d38) * col("diff")).as("sdd"))
      val n = col("n").cast("double")
      val mean = try_divide(col("sd").cast("double"), n)
      // try_divide: one line (degen single corpus) has no sample SD
      val sd = sqrt(try_divide(col("sdd").cast("double") -
        try_divide(col("sd").cast("double") * col("sd").cast("double"), n),
        n - 1.0))
      st.select(col("n").as("n_lines"),
        round(mean / 100.0, 2).as("bias_usd"),
        round((mean - lit(1.96) * sd) / 100.0, 2).as("loa_lower_usd"),
        round((mean + lit(1.96) * sd) / 100.0, 2).as("loa_upper_usd"))
    },
    Some("""
      WITH rows_ AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               - CAST(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS diff
        FROM lineitem JOIN part ON l_partkey = p_partkey
      ),
      st AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(diff AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sd,
               CAST(sum(CAST(diff AS DECIMAL(38,0)) * diff) AS DECIMAL(38,0))
                 AS sdd
        FROM rows_
      )
      SELECT n AS n_lines,
             round((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0, 2)
               AS bias_usd,
             round((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)
                    - 1.96 * sqrt((CAST(sdd AS DOUBLE)
                        - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
                          / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0))) / 100.0, 2)
               AS loa_lower_usd,
             round((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)
                    + 1.96 * sqrt((CAST(sdd AS DOUBLE)
                        - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
                          / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0))) / 100.0, 2)
               AS loa_upper_usd
      FROM st
    """))

  /** Rank-biserial effect size r = 2U/(n₁n₂) − 1 for the
    * BUILDING-vs-MACHINERY balance comparison — the magnitude companion
    * to q_mann_whitney's significance verdict (a huge corpus makes
    * trivial differences "significant"; r says whether anyone should
    * care). U comes from the doubled-rank machinery over the $100
    * value-level frame — the cumulative count per value via
    * [[graft.ops.Ranks.globalCumsum]]'s cutpoint buckets (r12: the
    * distinct-value frame grows with the balance domain, so the former
    * unpartitioned cumsum window was a single-task funnel; exact-long
    * prefix sums are reassociation-invariant) — exact end-to-end; r is
    * one double. */
  val rankBiserial = QuerySpec(
    "q_rank_biserial",
    (s, d) => {
      val rows = customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select((col("c_mktsegment") === "BUILDING").cast("int").as("g"),
          expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) " +
            "DIV 10000").as("v"))
      val binned = graft.ops.Checkpoints.materialize(
        rows.groupBy("v").agg(count(lit(1)).as("cnt")))
      val nParts = s.sessionState.conf.numShufflePartitions
      val vals = graft.ops.Ranks
        .globalCumsum(binned, Seq(col("v")), nParts, Seq("cum" -> "cnt"))
        .select(col("v"), (col("cum") * 2 - col("cnt") + 1).as("r2"))
      val piv = rows.join(vals, "v").agg(
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === 1, col("r2")).otherwise(0L)).as("sr1"))
      // U₁ = ΣR₁ − n₁(n₁+1)/2 with doubled ranks: 2U₁ = sr1 − n₁(n₁+1)
      val u2 = col("sr1") - col("n1") * (col("n1") + 1)
      val r = u2.cast("double") /
        (col("n1").cast("double") * col("n2").cast("double")) - 1.0
      piv.select(col("n1"), col("n2"), round(r, 6).as("rank_biserial"))
    },
    Some("""
      WITH rows_ AS (
        SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                 // 10000 AS v
        FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      ),
      vals AS (
        SELECT v, 2 * sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                 - cnt + 1 AS r2
        FROM (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM rows_
              GROUP BY v)
      ),
      piv AS (
        SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN g = 1 THEN r2 ELSE 0 END) AS BIGINT) AS sr1
        FROM rows_ JOIN vals USING (v)
      )
      SELECT n1, n2,
             round(CAST(sr1 - n1 * (n1 + 1) AS DOUBLE)
                   / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) - 1.0, 6)
               AS rank_biserial
      FROM piv
    """))

  /** Epidemiological effect-size panel for the deep-discount → return
    * association (the pooled 2×2 behind [[simpsonsCheck]]): risk ratio,
    * odds ratio, risk difference, number-needed-to-treat, and Cohen's h
    * (the arcsine-stabilized difference both engines evaluate through
    * the same asin∘sqrt chain on exact fractions). Significance already
    * lives in q_ab_test / q_mantel_haenszel; this row is the MAGNITUDE
    * ledger a decision actually reads. One aggregate, one double tree. */
  val effectSizes = QuerySpec(
    "q_effect_sizes",
    (s, d) => {
      val piv = lineitem(s, d).agg(
        sum(when(col("l_discount") > 0.05 && col("l_returnflag") === "R",
          1L).otherwise(0L)).as("a"),
        sum(when(col("l_discount") > 0.05 && col("l_returnflag") =!= "R",
          1L).otherwise(0L)).as("b"),
        sum(when(col("l_discount") <= 0.05 && col("l_returnflag") === "R",
          1L).otherwise(0L)).as("c"),
        sum(when(col("l_discount") <= 0.05 && col("l_returnflag") =!= "R",
          1L).otherwise(0L)).as("dd"))
      // try_divide: an arm absent from a degenerate corpus has no rate
      val p1 = try_divide(col("a").cast("double"),
        (col("a") + col("b")).cast("double"))
      val p0 = try_divide(col("c").cast("double"),
        (col("c") + col("dd")).cast("double"))
      val h = lit(2.0) * asin(sqrt(p1)) - lit(2.0) * asin(sqrt(p0))
      piv.select(
        round(try_divide(p1, p0), 6).as("risk_ratio"),
        round(try_divide(
          col("a").cast("double") * col("dd").cast("double"),
          col("b").cast("double") * col("c").cast("double")), 6)
          .as("odds_ratio"),
        round(p1 - p0, 6).as("risk_diff"),
        when(round(p1 - p0, 6) =!= 0.0,
          round(lit(1.0) / (p1 - p0), 2)).otherwise(lit(0.0)).as("nnt"),
        round(h, 6).as("cohens_h"))
    },
    Some("""
      WITH piv AS (
        SELECT CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag = 'R'
                 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag <> 'R'
                 THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN l_discount <= 0.05 AND l_returnflag = 'R'
                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN l_discount <= 0.05 AND l_returnflag <> 'R'
                 THEN 1 ELSE 0 END) AS BIGINT) AS dd
        FROM lineitem
      ),
      pp AS (
        SELECT a, b, c, dd,
               CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) AS p1,
               CAST(c AS DOUBLE) / CAST(c + dd AS DOUBLE) AS p0
        FROM piv
      )
      SELECT round(p1 / p0, 6) AS risk_ratio,
             round(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
                   / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6)
               AS odds_ratio,
             round(p1 - p0, 6) AS risk_diff,
             CASE WHEN round(p1 - p0, 6) <> 0.0
                  THEN round(1.0 / (p1 - p0), 2) ELSE 0.0 END AS nnt,
             round(2.0 * asin(sqrt(p1)) - 2.0 * asin(sqrt(p0)), 6)
               AS cohens_h
      FROM pp
    """))

  val all: Seq[QuerySpec] = Seq(
    anova, welchT, levene, mantelHaenszel, pacf,
    ccf, periodogram, jsDivergence, tCloseness,
    durbinWatson, breuschPagan, vif, hosmerLemeshow,
    poissonIrls, friedman, grubbs, sprt,
    cochranQ, hellinger, theilU, cvm,
    weibullFit, propensityStrata,
    lMoments, shapleyR2, abSrm, ksGof,
    pdp, simpsonsCheck, blandAltman, rankBiserial, effectSizes)
}
