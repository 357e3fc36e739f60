package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.{Series, Similarity, Text}

/** Ordered-sequence / time-series surface (graft.ops.Series) plus the
  * sparse-vector similarity join — extension operators in the SURVEY §2b
  * spirit. Every query keeps the oracle contract: exact integer counts,
  * copied (never order-summed) doubles, and fixed IEEE op sequences on
  * exact integers.
  */
object SeriesQueries {

  /** Gaps-and-islands: per-user consecutive-day activity streaks. The
    * anchor trick (day − row_number is constant within a run) turns
    * streak detection into one groupBy — no self-join, no iteration;
    * one shuffle on user_id serves the distinct, the window, and the
    * final aggregate. */
  val streaks = QuerySpec(
    "q_streak",
    (s, d) =>
      Series.dailyStreaks(events(s, d), "user_id", "ts")
        .orderBy("user_id"),
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      ),
      isl AS (
        SELECT user_id, day,
               day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                          AS INTEGER) AS anchor
        FROM days
      ),
      runs AS (SELECT user_id, anchor, count(*) AS len FROM isl GROUP BY 1, 2)
      SELECT user_id,
             CAST(sum(len) AS BIGINT) AS n_active_days,
             CAST(count(*) AS BIGINT) AS n_streaks,
             CAST(max(len) AS BIGINT) AS longest_streak
      FROM runs
      GROUP BY user_id
      ORDER BY user_id
    """))

  /** First-order Markov transition matrix over per-user event sequences:
    * counts of adjacent (from → to) event-type pairs and the conditional
    * P(to | from) — exact integer counts, one IEEE division. The matrix
    * is |types|² rows at any data scale. */
  val transitions = QuerySpec(
    "q_event_transitions",
    (s, d) =>
      Series.transitions(events(s, d), "user_id", "ts", "event_type",
          tiebreak = "event_id")
        .orderBy("from_type", "to_type"),
    Some("""
      WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
      ),
      cnts AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
        FROM pairs WHERE to_type IS NOT NULL
        GROUP BY 1, 2
      ),
      tot AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS from_total
              FROM cnts GROUP BY 1)
      SELECT from_type, to_type, cnt, from_total,
             CAST(cnt AS DOUBLE) / CAST(from_total AS DOUBLE) AS p_cond
      FROM cnts JOIN tot USING (from_type)
      ORDER BY from_type, to_type
    """))

  /** Daily resample + LOCF gap fill: per user, one row per calendar day
    * between their first and last event, carrying the day's last observed
    * value forward across silent days. Values are copied, never summed —
    * double-portable by construction. The spine is bounded by the user's
    * own date span (days × users ≪ events). */
  val gapFill = QuerySpec(
    "q_gap_fill",
    (s, d) =>
      Series.gapFillDaily(events(s, d), "user_id", "ts", "value",
          tiebreak = "event_id")
        .orderBy("user_id", "day"),
    Some("""
      WITH perday AS (
        SELECT user_id, day, observed FROM (
          SELECT user_id, CAST(ts AS DATE) AS day, value AS observed,
                 row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1
      ),
      spans AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY user_id
      ),
      spine AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM spans
      )
      SELECT s.user_id, s.day,
             last_value(observed IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day
                     ROWS UNBOUNDED PRECEDING) AS value,
             CAST(CASE WHEN observed IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
               AS is_observed
      FROM spine s LEFT JOIN perday p USING (user_id, day)
      ORDER BY s.user_id, s.day
    """))

  /** Exact-integer OLS: the monthly order-volume trend line. The five
    * sufficient statistics accumulate as exact longs in one map-side-
    * combinable pass; slope/intercept/r² are a fixed IEEE sequence on
    * those integers — bit-identical across engines AND partitionings,
    * where a naive avg-of-doubles regression drifts with reduction
    * order. */
  val linreg = QuerySpec(
    "q_linreg",
    (s, d) => {
      val monthly = orders(s, d)
        .select(((year(col("o_orderdate")) - 1992) * 12 +
          month(col("o_orderdate")) - 1).as("x"))
        .groupBy("x")
        .agg(count(lit(1)).as("y"))
      Series.olsFit(monthly, "x", "y")
    },
    Some("""
      WITH m AS (
        SELECT CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
                    AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM orders GROUP BY 1
      ),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM m
      ),
      k AS (
        SELECT n, sx, sy,
               n * sxy - sx * sy AS num,
               n * sxx - sx * sx AS denx,
               n * syy - sy * sy AS deny
        FROM s
      )
      SELECT n,
             CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) AS slope,
             (CAST(sy AS DOUBLE)
                - (CAST(num AS DOUBLE) / CAST(denx AS DOUBLE)) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS intercept,
             (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
               / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) AS r2
      FROM k
    """))

  /** Median absolute deviation per group — the robust dispersion statistic
    * (outlier-resistant sibling of stddev, which is banned from oracles:
    * order-dependent float accumulation). Two exact medians: the group
    * median, broadcast back, then the median of absolute deviations.
    * 100 TB variant: percentile_approx for both passes (mergeable
    * sketches), same documented swap as q_groupby_median. */
  val mad = QuerySpec(
    "q_mad",
    (s, d) => {
      val med = lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(median(col("l_extendedprice")).as("med_price"))
      fanOut(s, lineitem(s, d))
        .join(broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
          min(col("med_price")).as("med_price"),
          median(abs(col("l_extendedprice") - col("med_price")))
            .as("mad_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH med AS (
        SELECT l_returnflag, median(l_extendedprice) AS med_price
        FROM lineitem GROUP BY 1
      )
      SELECT l_returnflag,
             min(med_price) AS med_price,
             median(abs(l_extendedprice - med_price)) AS mad_price,
             count(*) AS n_rows
      FROM lineitem JOIN med USING (l_returnflag)
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  /** Sparse cosine similarity join over token-count vectors (inverted
    * index + df-cap pruning — graft.ops.Similarity.sparseCosinePairs):
    * top-20 most-similar document pairs by bag-of-words cosine, blocked
    * by lang. The dot products and norms are exact integers; each cosine
    * is the same three IEEE ops in both engines. */
  val sparseCosine = QuerySpec(
    "q_sparse_cosine",
    (s, d) => {
      val docs = fanOut(s, documents(s, d))
        .select(col("doc_id"), col("lang"),
          Text.tokens(col("text")).as("toks"))
      Similarity.sparseCosinePairs(docs, "doc_id", "toks",
          blockCols = Seq("lang"), dfCap = 64)
        .select(col("lang"), col("id_a"), col("id_b"), col("dot"), col("cos"))
        .orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
        .limit(20)
    },
    Some("""
      WITH tf AS (
        SELECT lang, doc_id, t, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT lang, doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '\W+'),
                                        x -> x <> '')) AS t
              FROM documents)
        GROUP BY 1, 2, 3
      ),
      kept AS (SELECT lang, t FROM tf GROUP BY lang, t HAVING count(*) <= 64),
      p AS (SELECT tf.* FROM tf JOIN kept USING (lang, t)),
      norms AS (SELECT lang, doc_id, CAST(sum(tf * tf) AS BIGINT) AS ss
                FROM p GROUP BY 1, 2),
      dots AS (
        SELECT a.lang AS lang, a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        FROM p a JOIN p b ON a.lang = b.lang AND a.t = b.t
                         AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3
      )
      SELECT d.lang, id_a, id_b, dot,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))) AS cos
      FROM dots d
      JOIN norms na ON na.lang = d.lang AND na.doc_id = d.id_a
      JOIN norms nb ON nb.lang = d.lang AND nb.doc_id = d.id_b
      ORDER BY cos DESC, id_a ASC, id_b ASC
      LIMIT 20
    """))

  val all: Seq[QuerySpec] = Seq(
    streaks, transitions, gapFill, linreg, mad, sparseCosine)
}
