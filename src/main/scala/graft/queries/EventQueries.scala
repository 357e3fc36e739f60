package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.Windows

/** Event-stream surface, batch twins (SURVEY §2b E5/E7). The streaming
  * twins (Structured Streaming with watermarks) live in graft.streaming —
  * same logical queries, no DuckDB oracle (driver-verifiable only in
  * batch form).
  */
object EventQueries {

  private val d38 = "decimal(38,0)"

  /** E5: JSON extraction from the events.props string column. `from_json`
    * with an explicit schema — parsed once, pruned like any struct. */
  val jsonExtract = QuerySpec(
    "q_json_extract",
    (s, d) =>
      events(s, d)
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
        .select("event_id", "event_type", "k")
        .orderBy("event_id"),
    Some("""
      -- nullif: DuckDB's JSON extract ERRORS on an empty string where
      -- Spark's from_json yields NULL (degen hollow)
      SELECT event_id, event_type,
             CAST(nullif(props, '')->>'$.k' AS INTEGER) AS k
      FROM events
      ORDER BY event_id
    """))

  /** E7 batch twin: 1-hour tumbling windows per event type. Uses Spark's
    * `window()` operator (struct start/end), projecting the start — the
    * exact groupBy(date_trunc) relational twin DuckDB can oracle. */
  val windowTumbling = QuerySpec(
    "q_window_tumbling",
    (s, d) =>
      Windows.tumblingByType(events(s, d))
        .orderBy("hour_start", "event_type"),
    Some("""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      -- ts IS NOT NULL: Spark's window() excludes NULL event-time by
      -- definition; the oracle matches that contract (degen hollow)
      WHERE ts IS NOT NULL
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))

  /** E7 sessionization (batch twin): 30-minute-gap sessions per user via
    * lag + running sum — one shuffle on (user_id), both windows and the
    * final groupBy reuse the same partitioning. */
  val sessionize = QuerySpec(
    "q_sessionize",
    (s, d) =>
      // an event with no event-time cannot be placed in any session —
      // excluded EXPLICITLY on both engines (degen hollow)
      Windows.sessionize(events(s, d).filter(col("ts").isNotNull),
          "user_id", "ts", gapSeconds = 1800,
          tiebreak = "event_id")
        .groupBy("user_id", "session_seq")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          (max(col("ts")).cast("long") - min(col("ts")).cast("long")).as("dur_s"))
        .orderBy("user_id", "session_seq"),
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
      )
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             count(*) AS n_events,
             CAST(min(ts) AS TIMESTAMP) AS session_start,
             CAST(max(ts) AS TIMESTAMP) AS session_end,
             date_diff('second', min(ts), max(ts)) AS dur_s
      FROM numbered
      GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq
    """))

  /** E7 via Spark's native session_window operator (batch mode; the
    * streaming form is graft.streaming.Streams.sessionsByUser). Oracle:
    * gaps-and-islands SQL — a new session starts at gap ≥ 30 min (µs
    * precision, matching session_window's half-open [start, last+gap)). */
  val sessionWindow = QuerySpec(
    "q_session_window",
    (s, d) =>
      // no event-time, no session — excluded explicitly on both engines
      Windows.sessionWindowByUser(events(s, d).filter(col("ts").isNotNull))
        .orderBy("user_id", "session_start"),
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS seq
        FROM flagged
      )
      SELECT CAST(min(ts) AS TIMESTAMP) AS session_start,
             CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
             user_id, count(*) AS n_events
      FROM numbered
      GROUP BY user_id, seq
      ORDER BY user_id, session_start
    """))

  /** As-of join (graft.ops.AsOf): each purchase gets the user's most
    * recent click at-or-before purchase time. Oracle: DuckDB's native
    * ASOF LEFT JOIN. Clicks are deduped per (user, ts) on both sides so
    * tie-picks can't differ. */
  val asofJoin = QuerySpec(
    "q_asof_join",
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("p_id"), col("value").as("p_value"))
      val clickW = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "ts").orderBy(col("event_id").desc)
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("__rn", row_number().over(clickW))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("ts"),
          col("event_id").as("c_id"), col("value").as("c_value"))
      graft.ops.AsOf.joinAsOf(purchases, clicks, Seq("user_id"), "ts", "ts")
        .withColumnRenamed("ts", "p_ts")
        .orderBy("p_id")
    },
    Some("""
      WITH p AS (
        SELECT user_id, ts, event_id AS p_id, value AS p_value
        FROM events WHERE event_type = 'purchase'
      ), c0 AS (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ), c AS (
        SELECT user_id, ts, event_id AS c_id, value AS c_value
        FROM c0 WHERE rn = 1
      )
      SELECT p.user_id, CAST(p.ts AS TIMESTAMP) AS p_ts, p.p_id, p.p_value,
             c.c_id, c.c_value
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p_id
    """))

  /** Ordered conversion funnel view → click → purchase: per-user earliest
    * qualifying timestamp per stage, each stage constrained to occur
    * STRICTLY AFTER the user's previous-stage time (the product-analytics
    * funnel, not three independent counts). Three conditional min-ts
    * aggregates chained by equi-joins on user_id — every stage is a plain
    * hash shuffle on the user key, so the funnel runs as one pipelined
    * DAG; at 100 TB the three aggregates co-partition and AQE keeps the
    * stage joins local. */
  val funnel = QuerySpec(
    "q_funnel",
    (s, d) => {
      val e = events(s, d)
      // v feeds both the click stage and its own count, c likewise —
      // cache() the stage frames so each aggregate runs once per session
      // (same plan-identity reuse as TextQueries' shingle/pair caches)
      // instead of re-aggregating events per downstream consumer.
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("vt"))
        .cache()
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("vt"))
        .groupBy("user_id").agg(min(col("ts")).as("ct"))
        .cache()
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("ct"))
        .groupBy("user_id").agg(min(col("ts")).as("pt"))
      import s.implicits._
      Seq("1_view", "2_click", "3_purchase").toDF("stage")
        .join(
          v.agg(count(lit(1)).as("n_view"))
            .crossJoin(c.agg(count(lit(1)).as("n_click")))
            .crossJoin(p.agg(count(lit(1)).as("n_purchase"))))
        .select(col("stage"),
          when(col("stage") === "1_view", col("n_view"))
            .when(col("stage") === "2_click", col("n_click"))
            .otherwise(col("n_purchase")).as("n_users"))
        .orderBy("stage")
    },
    Some("""
      WITH v AS (
        SELECT user_id, min(ts) AS vt FROM events
        WHERE event_type = 'view' GROUP BY user_id
      ), c AS (
        SELECT e.user_id, min(e.ts) AS ct
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.vt
        GROUP BY e.user_id
      ), p AS (
        SELECT e.user_id, min(e.ts) AS pt
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.ct
        GROUP BY e.user_id
      )
      SELECT '1_view' AS stage, (SELECT count(*) FROM v) AS n_users
      UNION ALL
      SELECT '2_click', (SELECT count(*) FROM c)
      UNION ALL
      SELECT '3_purchase', (SELECT count(*) FROM p)
      ORDER BY stage
    """))

  /** SCD type-2 history build: turn a change stream into
    * valid_from/valid_to interval rows per key (the warehouse "slowly
    * changing dimension" — each user's event_type attribute versioned
    * over time, open interval = current). One lead() window per user —
    * a single hash shuffle on the key; at 100 TB this is the standard
    * "rebuild dimension history from CDC log" pass. */
  val scd2 = QuerySpec(
    "q_scd2",
    (s, d) => {
      // asc_nulls_last: a NULL-ts change record sorts after every dated
      // one (DuckDB/SQL-standard ASC; hollow DegenGate) — otherwise it
      // would open the history and hand its lead() to the dated rows
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts").asc_nulls_last, col("event_id").asc)
      events(s, d)
        .select(
          col("user_id"), col("event_id"),
          col("event_type").as("attr"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"))
        .withColumn("is_current", col("valid_to").isNull.cast("int"))
        .orderBy("user_id", "valid_from", "event_id")
    },
    Some("""
      SELECT user_id, event_id, event_type AS attr,
             CAST(ts AS TIMESTAMP) AS valid_from,
             CAST(lead(ts, 1) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC)
                  AS TIMESTAMP) AS valid_to,
             CASE WHEN lead(ts, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts ASC, event_id ASC)
                    IS NULL THEN 1 ELSE 0 END AS is_current
      FROM events
      ORDER BY user_id, valid_from, event_id
    """))

  /** Cohort retention: users grouped by first-activity day, counted in
    * each subsequent activity week (weeks-since-cohort = day-diff DIV 7 —
    * integer bucketing, not calendar weeks, so both engines agree without
    * week-start conventions). Two aggregates on the user key plus one on
    * the cohort grid; the user-day dedup is the only wide stage. */
  val cohortRetention = QuerySpec(
    "q_cohort_retention",
    (s, d) => {
      val acts = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val firsts = acts.groupBy("user_id").agg(min("day").as("cohort_day"))
      acts.join(firsts, "user_id")
        .withColumn("week_idx", expr("CAST(datediff(day, cohort_day) DIV 7 AS INT)"))
        .groupBy("cohort_day", "week_idx")
        .agg(countDistinct("user_id").as("n_users"))
        // timestamp: the oracle's DATE fetches as datetime64 and the
        // strict hash is type-sensitive (date-class queries all align on
        // timestamp output)
        .select(col("cohort_day").cast("timestamp").as("cohort_day"),
          col("week_idx"), col("n_users"))
        .orderBy("cohort_day", "week_idx")
    },
    Some("""
      WITH acts AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      ), firsts AS (
        SELECT user_id, min(day) AS cohort_day FROM acts GROUP BY user_id
      )
      SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
             CAST(date_diff('day', f.cohort_day, a.day) // 7 AS INTEGER) AS week_idx,
             count(DISTINCT a.user_id) AS n_users
      FROM acts a JOIN firsts f ON a.user_id = f.user_id
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))

  /** Last-touch attribution: each purchase is credited to the same
    * user's most recent PRIOR view. One window over one user_id shuffle
    * — no self-join, no as-of join: `last(..., ignoreNulls)` over an
    * unbounded-preceding-to-1-preceding frame carries the latest view id
    * forward. The gap is exact integer microseconds. Purchases with no
    * prior view keep NULL attribution (first-session conversions). */
  val attribution = QuerySpec(
    "q_attribution",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      events(s, d)
        // both carried values in ONE projection → a single Window node
        // (sequential withColumns can leave two stacked Window operators)
        .select(
          col("event_id"), col("user_id"), col("event_type"), col("ts"),
          last(when(col("event_type") === "view", col("event_id")),
            ignoreNulls = true).over(w).as("attr_event_id"),
          last(when(col("event_type") === "view", col("ts")),
            ignoreNulls = true).over(w).as("attr_ts"))
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"), col("user_id"), col("attr_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("attr_ts"))).as("gap_us"))
        .orderBy("event_id")
    },
    Some("""
      WITH w AS (
        SELECT event_id, user_id, event_type, ts,
               last_value(CASE WHEN event_type = 'view' THEN event_id END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS attr_event_id,
               last_value(CASE WHEN event_type = 'view' THEN ts END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS attr_ts
        FROM events)
      SELECT event_id, user_id, attr_event_id,
             CAST((epoch_ns(ts) - epoch_ns(attr_ts)) // 1000 AS BIGINT)
               AS gap_us
      FROM w WHERE event_type = 'purchase'
      ORDER BY event_id
    """))

  /** Tukey-fence (1.5·IQR) outlier report per event type: exact q1/q3
    * (same quantile_cont-portable interpolation q_winsorize pins), fences
    * as one fixed IEEE sequence, counts as exact ints. The quartile table
    * is |types| rows → broadcast back; percentile_approx is the
    * documented 100 TB swap for the quartile pass. */
  val outlierIqr = QuerySpec(
    "q_outlier_iqr",
    (s, d) => {
      val pct = fanOut(s, events(s, d))
        .groupBy("event_type")
        .agg(
          expr("percentile(value, 0.25D)").as("q1"),
          expr("percentile(value, 0.75D)").as("q3"))
      events(s, d)
        .join(broadcast(pct), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value") < col("q1") - lit(1.5) * (col("q3") - col("q1")),
            1L).otherwise(0L)).as("n_low"),
          sum(when(col("value") > col("q3") + lit(1.5) * (col("q3") - col("q1")),
            1L).otherwise(0L)).as("n_high"))
        .select(
          col("event_type"),
          (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo"),
          (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi"),
          col("n"), col("n_low"), col("n_high"))
        .orderBy("event_type")
    },
    Some("""
      WITH pct AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY 1)
      SELECT event_type,
             q1 - 1.5*(q3-q1) AS lo,
             q3 + 1.5*(q3-q1) AS hi,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value < q1 - 1.5*(q3-q1) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_low,
             CAST(sum(CASE WHEN value > q3 + 1.5*(q3-q1) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_high
      FROM events JOIN pct USING (event_type)
      GROUP BY event_type, q1, q3
      ORDER BY event_type
    """))

  /** RFM customer scoring: per-user recency (hours since last event,
    * anchored at the corpus max — reproducible, no wall clock), frequency
    * (exact count) and monetary (decimal-accumulated, cast to double
    * once), then quintile labels and the composite RFM segment.
    *
    * Scale form: each quintile label comes from [[graft.ops.Ranks]] —
    * literal-cutpoint buckets + a partition-LOCAL row_number, then
    * ntile-by-arithmetic — so even a billions-of-users aggregate never
    * passes through a single-task window (the three `ntile(5) OVER
    * (ORDER BY …)` this replaces funneled the whole user table through
    * one partition, three times; PlanSpec asserts none remain). DESC
    * metrics rank by their negation; the user_id tiebreak sits inside
    * the rank order, so ties split EXACTLY as the window form's — which
    * is why the ntile-based oracle is unchanged. The user aggregate is
    * lazily localCheckpoint'ed first: the three rank passes then read
    * one materialization instead of re-aggregating events six times for
    * their count/cutpoint jobs. */
  val rfm = QuerySpec(
    "q_rfm",
    (s, d) => {
      val agg = events(s, d)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("frequency"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("monetary"),
          max(col("ts")).as("last_ts"))
        .localCheckpoint(false)
      val mx = agg.agg(max(col("last_ts")).as("now_ts"))
      val nParts = s.sessionState.conf.numShufflePartitions
      // ntile(5) OVER (ORDER BY key DESC, user_id) ≡ ntileFromRank over
      // the (-key, user_id) ascending rank — bit-identical, ties included.
      // A NULL metric (all-NULL-value user ⇒ monetary = sum(NULL) = NULL)
      // must rank LAST: both the window form's `desc` and the oracle's
      // DESC default to NULLS LAST, while a raw ascending rank would put
      // NULL first — so the key coalesces to Double.MaxValue (beyond any
      // real metric; the long keys stay under 2^53 so the double cast is
      // order-exact), keeping NULL users in the worst quintile with the
      // same user_id tiebreak among themselves.
      def quintile(negKey: org.apache.spark.sql.Column, name: String) =
        graft.ops.Ranks
          .globalRank(agg.select(col("user_id"),
            coalesce(negKey.cast("double"), lit(Double.MaxValue)).as("__key")),
            Seq(col("__key"), col("user_id")), nParts, "__rk",
            totalCol = Some("__n"))
          .select(col("user_id"),
            graft.ops.Ranks.ntileFromRank(col("__rk"), col("__n"), 5)
              .cast("long").as(name))
      val r = quintile(lit(0L) - unix_micros(col("last_ts")), "r_quintile")
      val f = quintile(lit(0L) - col("frequency"), "f_quintile")
      val m = quintile(lit(0.0) - col("monetary"), "m_quintile")
      agg.crossJoin(broadcast(mx))
        .withColumn("recency_hours",
          expr("(unix_micros(now_ts) - unix_micros(last_ts)) DIV 3600000000"))
        .join(r, "user_id").join(f, "user_id").join(m, "user_id")
        .withColumn("rfm_segment",
          (col("r_quintile") * 100 + col("f_quintile") * 10 +
            col("m_quintile")).cast("long"))
        .select("user_id", "frequency", "monetary", "recency_hours",
          "r_quintile", "f_quintile", "m_quintile", "rfm_segment")
        .orderBy("user_id")
    },
    Some("""
      WITH agg AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary,
               max(ts) AS last_ts
        FROM events GROUP BY user_id
      ),
      mx AS (SELECT max(last_ts) AS now_ts FROM agg)
      SELECT user_id, frequency, monetary,
             CAST((epoch_ns(now_ts) - epoch_ns(last_ts)) // 3600000000000
                  AS BIGINT) AS recency_hours,
             CAST(ntile(5) OVER (ORDER BY last_ts DESC, user_id)
                  AS BIGINT) AS r_quintile,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
                  AS BIGINT) AS f_quintile,
             CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id)
                  AS BIGINT) AS m_quintile,
             CAST(ntile(5) OVER (ORDER BY last_ts DESC, user_id) * 100
                  + ntile(5) OVER (ORDER BY frequency DESC, user_id) * 10
                  + ntile(5) OVER (ORDER BY monetary DESC, user_id)
                  AS BIGINT) AS rfm_segment
      FROM agg CROSS JOIN mx
      ORDER BY user_id
    """))

  /** Recency-weighted engagement score — the feed-ranking / training-data
    * reweighting primitive "recent activity counts more", derandomized so
    * the decayed float is EXACT: weight(age) = 2^(30−age) is a dyadic
    * integer (no transcendental pow), the per-user sum is pure BIGINT
    * arithmetic, and the final score divides once by 2³⁰ — a power of
    * two, so the double conversion is lossless in both engines.
    * Selection (top-100) orders by the INTEGER sum, never the float.
    *
    * The anchor date is collected driver-side and embedded as a plan
    * literal (the q_bloom_join / heavy-hitters "query parameter"
    * precedent): at 100 TB the anchor is a pipeline parameter and the
    * age-window predicate prunes the date-partitioned event log to the
    * last 31 days before anything shuffles. The aggregate is map-side
    * combinable (sum/count), the top-100 a TakeOrdered — no window, no
    * global sort. */
  val decayScore = QuerySpec(
    "q_decay_score",
    (s, d) => {
      val anchor = events(s, d).agg(max(to_date(col("ts")))).head.getDate(0)
      events(s, d)
        .withColumn("age", datediff(lit(anchor), to_date(col("ts"))))
        .filter(col("age").between(0, 30))
        .withColumn("wt", expr("shiftleft(CAST(1 AS BIGINT), 30 - age)"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("wt")).as("scaled"))
        .orderBy(col("scaled").desc, col("user_id").asc)
        .limit(100)
        .select(col("user_id"), col("n_events"),
          (col("scaled") / lit(1073741824.0)).as("score"))
        .orderBy("user_id")
    },
    Some("""
      WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS a FROM events),
      w AS (
        SELECT user_id,
               CAST(1 AS BIGINT)
                 << (30 - date_diff('day', CAST(ts AS DATE),
                                    (SELECT a FROM anchor))) AS wt
        FROM events
        WHERE date_diff('day', CAST(ts AS DATE), (SELECT a FROM anchor))
              BETWEEN 0 AND 30
      ),
      agg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                     sum(wt) AS scaled
              FROM w GROUP BY user_id),
      top AS (SELECT * FROM agg ORDER BY scaled DESC, user_id LIMIT 100)
      SELECT user_id, n_events, CAST(scaled AS DOUBLE) / 1073741824.0 AS score
      FROM top
      ORDER BY user_id
    """))

  /** E5 sibling: XML extraction via Spark 4's native `from_xml` — the
    * other structured-payload format a feed pipeline meets. Records are
    * built in-plan from doc_id arithmetic and must round-trip through a
    * REAL XML parse: an attribute (`_id` under the default attribute
    * prefix), a text element, a numeric element, and a REPEATED element
    * parsed as an array (projected back to scalars for the gate — the
    * driver compare can't sort array cells). The oracle replays the
    * arithmetic without parsing, so a schema-mapping or attribute-prefix
    * bug hash-mismatches. */
  val xmlExtract = QuerySpec(
    "q_xml_extract",
    (s, d) => {
      import org.apache.spark.sql.types._
      val xml = concat(
        lit("<rec id=\""), col("doc_id"), lit("\"><name>item-"),
        (col("doc_id") % 7).cast("string"), lit("</name><qty>"),
        (col("doc_id") % 100).cast("string"), lit("</qty><tags><tag>"),
        (col("doc_id") % 3).cast("string"), lit("</tag><tag>"),
        (col("doc_id") % 5).cast("string"), lit("</tag></tags></rec>"))
      val schema = StructType(Seq(
        StructField("_id", LongType), StructField("name", StringType),
        StructField("qty", LongType),
        StructField("tags",
          StructType(Seq(StructField("tag", ArrayType(LongType)))))))
      documents(s, d)
        .select(col("doc_id"), from_xml(xml, schema).as("rec"))
        .select(col("doc_id"), col("rec._id").as("xid"),
          col("rec.name").as("name"), col("rec.qty").as("qty"),
          size(col("rec.tags.tag")).cast("long").as("n_tags"),
          element_at(col("rec.tags.tag"), 1).as("tag_a"),
          element_at(col("rec.tags.tag"), 2).as("tag_b"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, doc_id AS xid,
             'item-' || CAST(doc_id % 7 AS VARCHAR) AS name,
             doc_id % 100 AS qty,
             CAST(2 AS BIGINT) AS n_tags,
             doc_id % 3 AS tag_a, doc_id % 5 AS tag_b
      FROM documents
      ORDER BY doc_id
    """))

  /** E5 third leg: single-record CSV parse via `from_csv` — the embedded-
    * line shape (a CSV payload INSIDE a column, not a CSV file scan; the
    * file scan is S6). The quoted field carries a literal comma and must
    * survive: a naive split() dies exactly there, which is why the parse
    * is worth gating. Oracle replays the arithmetic, never parsing. */
  val csvExtract = QuerySpec(
    "q_csv_extract",
    (s, d) => {
      import org.apache.spark.sql.types._
      val line = concat(
        col("doc_id").cast("string"), lit(",name-"),
        (col("doc_id") % 7).cast("string"), lit(","),
        (col("doc_id") % 100).cast("string"), lit(",\"v,"),
        (col("doc_id") % 3).cast("string"), lit("\""))
      val schema = StructType(Seq(
        StructField("cid", LongType), StructField("name", StringType),
        StructField("qty", LongType), StructField("note", StringType)))
      documents(s, d)
        .select(col("doc_id"),
          from_csv(line, schema, Map.empty[String, String]).as("rec"))
        .select(col("doc_id"), col("rec.cid").as("cid"),
          col("rec.name").as("name"), col("rec.qty").as("qty"),
          col("rec.note").as("note"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, doc_id AS cid,
             'name-' || CAST(doc_id % 7 AS VARCHAR) AS name,
             doc_id % 100 AS qty,
             'v,' || CAST(doc_id % 3 AS VARCHAR) AS note
      FROM documents
      ORDER BY doc_id
    """))

  /** Sequential journey patterns: which ordered TYPE TRIPLES (a → b → c)
    * do users actually traverse, by FIRST occurrence of each type —
    * support = users whose first a preceded their first b preceded their
    * first c. Unlike q_funnel (one fixed path) this MINES the paths; the
    * first-occurrence projection is what makes it tractable — each user
    * contributes ≤ |types| timestamps, so the triple fan-out is ≤ 60
    * rows/user regardless of event volume (raw position-triples would be
    * n³/user — the PrefixSpan projection argument). Ordering is the
    * exact (ts, event_id) tuple — struct comparison in the join, row
    * comparison in the oracle — so sub-millisecond ties never flap.
    * One groupBy for the first-occurrence frame (map-side combinable),
    * two user-key self-joins over it, one count. */
  val journeyPatterns = QuerySpec(
    "q_journey_patterns",
    (s, d) => {
      val f = events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(struct(col("ts"), col("event_id"))).as("ft"))
      def side(n: String) = f.select(col("user_id"),
        col("event_type").as(n), col("ft").as(s"ft_$n"))
      side("a")
        .join(side("b"), "user_id")
        .join(side("c"), "user_id")
        .filter(col("ft_a") < col("ft_b") && col("ft_b") < col("ft_c"))
        .groupBy("a", "b", "c")
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 5)
        .orderBy(col("support").desc, col("a"), col("b"), col("c"))
    },
    Some("""
      WITH f AS (
        SELECT user_id, event_type,
               min(ROW(ts, event_id)) AS ft
        FROM events
        GROUP BY 1, 2
      )
      SELECT a.event_type AS a, b.event_type AS b, c.event_type AS c,
             CAST(count(*) AS BIGINT) AS support
      FROM f a
      JOIN f b ON b.user_id = a.user_id AND a.ft < b.ft
      JOIN f c ON c.user_id = a.user_id AND b.ft < c.ft
      GROUP BY 1, 2, 3
      HAVING count(*) >= 5
      ORDER BY support DESC, a, b, c
    """))

  /** Sequential-pattern SUPPORT (PrefixSpan semantics): a user supports
    * pattern a→b iff ANY occurrence of a precedes ANY occurrence of b —
    * not just the first occurrences [[journeyPatterns]] projects (the
    * journey "b a b" supports a→b here, but first-occurrence says b
    * came first). The exact check stays LINEAR via extremes instead of
    * position self-joins: a→b exists iff first(a) < last(b), and
    * a→b→c exists iff min{pos(b) > first(a)} < last(c) — the earliest
    * b usable after a's first occurrence, then any later c. So the
    * per-user work is O(events·|types|), never O(events²): one
    * extremes groupBy (≤ |types| rows/user), one events⋈extremes join
    * for the conditional-min frame, and bounded-fanout joins over
    * ≤ |types|-row-per-user sides — the shape that survives 100 TB
    * where raw position-pair joins quadratically explode on power
    * users. Ordering is the exact (ts, event_id) struct (sub-ms ties
    * never flap). */
  val seqSupport = QuerySpec(
    "q_seq_support",
    (s, d) => {
      val pos = events(s, d).select(col("user_id"), col("event_type"),
        struct(col("ts"), col("event_id")).as("p"))
      // localCheckpoint, not cache: this frame scales with users×types
      // (corpus-proportional) and serves three join branches — an
      // unreleased .cache() here is a session-lifetime leak (the
      // prefixCandidates lesson); checkpoint blocks are reclaimed on
      // dereference
      val ext = pos.groupBy("user_id", "event_type")
        .agg(min("p").as("fp"), max("p").as("lp")).localCheckpoint()
      def side(n: String, c: String) = ext.select(col("user_id"),
        col("event_type").as(n), col(c).as(s"${c}_$n"))
      val two = side("a", "fp").join(side("b", "lp"), "user_id")
        .filter(col("fp_a") < col("lp_b"))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
        .select(concat(col("a"), lit(">"), col("b")).as("pattern"),
          col("support"))
      val mid = pos.join(side("a", "fp"), "user_id")
        .filter(col("p") > col("fp_a"))
        .select(col("user_id"), col("a"), col("event_type").as("b"),
          col("p"))
        .groupBy("user_id", "a", "b")
        .agg(min("p").as("mp"))
      val three = mid.join(side("c", "lp"), "user_id")
        .filter(col("mp") < col("lp_c"))
        .groupBy("a", "b", "c").agg(count(lit(1)).as("support"))
        .select(concat(col("a"), lit(">"), col("b"), lit(">"), col("c"))
          .as("pattern"), col("support"))
      two.unionByName(three)
        .filter(col("support") >= 5)
        .orderBy(col("support").desc, col("pattern"))
    },
    Some("""
      WITH pos AS (
        SELECT user_id, event_type, ROW(ts, event_id) AS p FROM events
      ),
      ext AS (
        SELECT user_id, event_type, min(p) AS fp, max(p) AS lp
        FROM pos GROUP BY 1, 2
      ),
      two AS (
        SELECT a.event_type || '>' || b.event_type AS pattern,
               CAST(count(*) AS BIGINT) AS support
        FROM ext a JOIN ext b ON b.user_id = a.user_id AND a.fp < b.lp
        GROUP BY 1
      ),
      mid AS (
        SELECT p.user_id, a.event_type AS ta, p.event_type AS tb,
               min(p.p) AS mp
        FROM pos p JOIN ext a ON a.user_id = p.user_id AND p.p > a.fp
        GROUP BY 1, 2, 3
      ),
      three AS (
        SELECT m.ta || '>' || m.tb || '>' || c.event_type AS pattern,
               CAST(count(*) AS BIGINT) AS support
        FROM mid m JOIN ext c ON c.user_id = m.user_id AND m.mp < c.lp
        GROUP BY 1
      )
      SELECT pattern, support
      FROM (SELECT * FROM two UNION ALL SELECT * FROM three)
      WHERE support >= 5
      ORDER BY support DESC, pattern
    """))

  /** Growth accounting — the DAU ledger every product pipeline keeps:
    * per calendar day, users split into new (first-ever activity),
    * retained (also active the previous day), resurrected (seen before,
    * but not yesterday), plus yesterday's actives who went quiet
    * (churned). The per-user day sequence comes from ONE distinct
    * (user, day) frame + one lag window partitioned BY USER (bounded
    * state); day totals are exact counts. Identity by construction —
    * dau = new + retained + resurrected — double-counted nowhere,
    * spec-asserted. */
  val growthAccounting = QuerySpec(
    "q_growth_accounting",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val acts = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      // asc_nulls_last: an unknown-day activity sorts after every dated
      // one, as in DuckDB's ASC (hollow DegenGate)
      val wDay = W.partitionBy("user_id").orderBy(col("day").asc_nulls_last)
      val seq0 = acts
        .withColumn("prev_day", lag("day", 1).over(wDay))
        .withColumn("nxt_day", lead("day", 1).over(wDay))
      val daily = seq0.groupBy("day").agg(
        count(lit(1)).as("dau"),
        sum(col("prev_day").isNull.cast("long")).as("new_users"),
        // prev_day NULL on a user's first day → the comparison is NULL,
        // and an all-new day would sum to NULL instead of 0: coalesce.
        sum(coalesce((col("prev_day") === date_sub(col("day"), 1))
          .cast("long"), lit(0L))).as("retained"),
        // coalesce: on a NULL day the < comparison is NULL, and the
        // oracle's CASE lands in ELSE 0 (hollow DegenGate)
        sum(coalesce((col("prev_day").isNotNull &&
          col("prev_day") < date_sub(col("day"), 1)).cast("long"), lit(0L)))
          .as("resurrected"),
        // users active today whose NEXT activity is not tomorrow —
        // i.e. tomorrow's churn contribution from today's actives
        sum((col("nxt_day").isNull ||
          col("nxt_day") > date_add(col("day"), 1)).cast("long"))
          .as("churned_after"))
      // timestamp day: strict-hash type alignment with the oracle's
      // fetched datetime64 (see q_cohort_retention)
      daily.withColumn("day", col("day").cast("timestamp")).orderBy("day")
    },
    Some("""
      WITH acts AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      ),
      seq AS (
        SELECT user_id, day,
               lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
               lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt_day
        FROM acts
      )
      SELECT CAST(day AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS dau,
             CAST(sum(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS new_users,
             CAST(sum(CASE WHEN prev_day = day - INTERVAL 1 DAY
               THEN 1 ELSE 0 END) AS BIGINT) AS retained,
             CAST(sum(CASE WHEN prev_day IS NOT NULL
               AND prev_day < day - INTERVAL 1 DAY THEN 1 ELSE 0 END)
               AS BIGINT) AS resurrected,
             CAST(sum(CASE WHEN nxt_day IS NULL
               OR nxt_day > day + INTERVAL 1 DAY THEN 1 ELSE 0 END)
               AS BIGINT) AS churned_after
      FROM seq
      GROUP BY day
      ORDER BY day
    """))

  /** Page–Hinkley mean-shift monitor on daily revenue — the sequential
    * changepoint test that watches for a SUSTAINED upward drift (the
    * streaming cousin of q_cusum's single retrospective split). The
    * batch form stays exact integers end-to-end by cross-multiplying
    * the global mean out: mₜ = n·Pₜ − t·S − t·n·δ (P = prefix sum,
    * S = total, δ = $500/day drift allowance in cents), PHₜ =
    * mₜ − min_{i≤t} mᵢ, alarm at the first day PHₜ > λ·n (λ = $50k).
    * Both windows run over the calendar-bounded daily frame. */
  val pageHinkley = QuerySpec(
    "q_page_hinkley",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val delta = 50000L // cents/day
      val lambda = 5000000L // cents
      val daily = orders(s, d)
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("t"))
        .agg(sum(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("v"))
      val tot = daily.agg(count(lit(1)).as("n"),
        sum(col("v").cast(d38)).as("sv"))
      val wPre = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
      val m = daily.crossJoin(broadcast(tot))
        .withColumn("idx", count(lit(1)).over(wPre))
        .withColumn("p", sum(col("v").cast(d38)).over(wPre))
        .withColumn("m", col("n").cast(d38) * col("p") -
          col("idx").cast(d38) * col("sv") -
          col("idx").cast(d38) * col("n") * delta)
        .withColumn("mmin", min("m").over(wPre))
        .withColumn("ph", col("m") - col("mmin"))
      val alarm = m.agg(
        max(col("n")).as("n_days"),
        min(when(col("ph") > col("n").cast(d38) * lambda, col("t")))
          .as("alarm_t"),
        // per-day-normalized PH as a double (ph DIV n would hit DuckDB's
        // decimal-//-through-DOUBLE rounding past 2⁵³ — the session's
        // recorded lesson); identical doubles, deterministic max
        max(col("ph").cast("double") / col("n").cast("double"))
          .as("max_ph_cents"))
      alarm.select(col("n_days"),
        coalesce(col("alarm_t"), lit(-1L)).cast("int").as("alarm_day"),
        (col("alarm_t").isNotNull).cast("int").as("drift_detected"),
        round(col("max_ph_cents") / 100.0, 2).as("max_ph_usd"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS t,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS v
        FROM orders GROUP BY 1
      ),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0))
                       AS sv
              FROM daily),
      pre AS (
        SELECT t, n, sv,
               CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS idx,
               CAST(sum(CAST(v AS DECIMAL(38,0)))
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                 AS DECIMAL(38,0)) AS p
        FROM daily CROSS JOIN tot
      ),
      mm AS (
        SELECT t, n,
               CAST(n AS DECIMAL(38,0)) * p
                 - CAST(idx AS DECIMAL(38,0)) * sv
                 - CAST(idx AS DECIMAL(38,0)) * n * 50000 AS m
        FROM pre
      ),
      ph AS (
        SELECT t, n, m,
               m - min(m) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS ph
        FROM mm
      )
      SELECT max(n) AS n_days,
             CAST(coalesce(min(CASE WHEN ph > CAST(n AS DECIMAL(38,0))
               * 5000000 THEN t END), -1) AS INTEGER) AS alarm_day,
             CAST(min(CASE WHEN ph > CAST(n AS DECIMAL(38,0)) * 5000000
               THEN t END) IS NOT NULL AS INTEGER) AS drift_detected,
             round(max(CAST(ph AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0, 2)
               AS max_ph_usd
      FROM ph
    """))

  /** Stickiness (DAU/WAU): per activity day, the share of the trailing
    * 7-day active base that showed up today. EXACT form: each distinct
    * (user, day) row fans out to the ≤ 7 future days it supports
    * (one bounded explode — 7×, never a sliding distinct-state window),
    * then one distinct + count per day. At 100 TB the same ledger runs
    * on the HLL rollup (q_sketch_rollup) — this is the exact twin that
    * validates it. Days outside the observed activity spine drop
    * (WAU is only reported where DAU exists). */
  val stickiness = QuerySpec(
    "q_stickiness",
    (s, d) => {
      val acts = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val dau = acts.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = acts
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("k"),
          col("day"))
        .select(col("user_id"), date_add(col("day"), col("k")).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day").cast("timestamp").as("day"), // strict-hash type
          col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
        .orderBy("day")
    },
    Some("""
      WITH acts AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      ),
      dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
              FROM acts GROUP BY day),
      sup AS (
        SELECT DISTINCT user_id, day + to_days(CAST(k AS INTEGER)) AS day
        FROM acts, (SELECT unnest(range(7)) AS k)
      ),
      wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
              FROM sup GROUP BY day)
      SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau, wau.wau,
             round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
               AS stickiness
      FROM dau JOIN wau USING (day)
      ORDER BY day
    """))

  /** Cohort LTV triangle: cumulative per-user value by acquisition
    * cohort (first-activity day) and weekly age — the revenue view of
    * [[cohortRetention]]. Value sums in DECIMAL(18,4) (order-free), the
    * cumulative runs over the BOUNDED per-cohort age axis (≤ 5 weekly
    * ages in a 30-day window; age count is span-bounded at any scale),
    * and per-user LTV is one division by the cohort size. */
  val ltvTriangle = QuerySpec(
    "q_ltv_triangle",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val acts = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      val firsts = acts.groupBy("user_id").agg(min("day").as("cohort_day"))
      val sizes = firsts.groupBy("cohort_day")
        .agg(count(lit(1)).as("cohort_n"))
      val cells = acts.join(firsts, "user_id")
        .groupBy(col("cohort_day"),
          expr("CAST(datediff(day, cohort_day) DIV 7 AS INT)")
            .as("age_week"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("rev"))
      cells.join(sizes, "cohort_day")
        // asc_nulls_last: DuckDB's ORDER BY age_week seats the unknown-
        // age cell LAST in the cumulative (hollow DegenGate)
        .withColumn("cum_rev", sum("rev").over(
          W.partitionBy("cohort_day").orderBy(col("age_week").asc_nulls_last)
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .select(col("cohort_day").cast("timestamp").as("cohort_day"),
          col("age_week"), col("cohort_n"),
          col("rev").cast("double").as("rev"),
          col("cum_rev").cast("double").as("cum_rev"),
          round(col("cum_rev").cast("double") /
            col("cohort_n").cast("double"), 6).as("ltv_per_user"))
        .orderBy("cohort_day", "age_week")
    },
    Some("""
      WITH acts AS (
        SELECT user_id, CAST(ts AS DATE) AS day, value FROM events
      ),
      firsts AS (SELECT user_id, min(day) AS cohort_day
                 FROM acts GROUP BY user_id),
      sizes AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_n
                FROM firsts GROUP BY cohort_day),
      cells AS (
        SELECT cohort_day,
               CAST((day - cohort_day) // 7 AS INTEGER) AS age_week,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4))
                 AS rev
        FROM acts JOIN firsts USING (user_id)
        GROUP BY 1, 2
      )
      SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day, age_week, cohort_n,
             CAST(rev AS DOUBLE) AS rev,
             CAST(sum(rev) OVER (PARTITION BY cohort_day ORDER BY age_week
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev,
             round(CAST(sum(rev) OVER (PARTITION BY cohort_day
                 ORDER BY age_week ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(cohort_n AS DOUBLE), 6) AS ltv_per_user
      FROM cells JOIN sizes USING (cohort_day)
      ORDER BY cohort_day, age_week
    """))

  val all: Seq[QuerySpec] = Seq(
    jsonExtract, windowTumbling, sessionize, sessionWindow, asofJoin, funnel,
    scd2, cohortRetention, attribution, outlierIqr, rfm, decayScore,
    xmlExtract, csvExtract, journeyPatterns, seqSupport,
    growthAccounting, pageHinkley, stickiness, ltvTriangle)
}
