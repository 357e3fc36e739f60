package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.Replay

/** The Structured-Streaming surface under the hash gate (SURVEY §2b E7):
  * each query replays the events table through the REAL streaming
  * operators — MemoryStream micro-batches, watermarks, state stores,
  * append/update sinks (graft.streaming.Replay's scaladoc carries the
  * replay-honesty argument) — and the oracle is the batch SQL, so
  * streaming-vs-batch equivalence IS the check: any watermark,
  * state-store, late-drop, or cross-batch-state defect hash-mismatches
  * every round instead of only failing specs.
  *
  * The MemoryStream replays run over the CAPPED corpus — the first
  * [[Replay.FeedCap]] events in (ts, event_id) order, a constant at any
  * SF (Replay.cappedEvents has the argument; at the sf0.01 gate the cap
  * is the identity) — so every oracle below scopes `events` to the same
  * window via the `events_w` CTE. The file-source twin q_stream_file
  * never collects and stays full-table.
  */
object StreamingQueries {

  /** The oracle-side twin of [[Replay.cappedEvents]]: same total order,
    * same constant cap. Spliced as the first CTE of every MemoryStream
    * oracle (DuckDB rejects a CTE shadowing the `events` view, hence the
    * `_w` name). */
  private val EventsW =
    s"events_w AS (SELECT * FROM events ORDER BY ts, event_id LIMIT ${Replay.FeedCap})"

  /** Watermarked tumbling aggregation (q_window_tumbling's plan through
    * the streaming state store). */
  val streamTumbling = QuerySpec(
    "q_stream_tumbling",
    (s, d) => Replay.tumbling(s, d)
      .orderBy("hour_start", "event_type"),
    Some(s"""
      WITH $EventsW
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events_w
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))

  /** [[streamTumbling]] re-run on the RocksDB state store — the
    * disk-backed provider class a 100 TB streaming deployment uses (heap
    * holds only the working set; state spills to local disk with
    * changelog files). Same operators, same batch oracle: both providers
    * must produce the identical answer, so a provider-dependent defect
    * is a hash mismatch, not a config footnote. */
  val streamTumblingRocksDb = QuerySpec(
    "q_stream_tumbling_rocksdb",
    (s, d) => Replay.tumblingRocksDb(s, d)
      .orderBy("hour_start", "event_type"),
    Some(s"""
      WITH $EventsW
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events_w
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))

  /** Native session_window state merge (q_session_window's
    * gaps-and-islands oracle). */
  val streamSessions = QuerySpec(
    "q_stream_sessions",
    (s, d) => Replay.sessions(s, d)
      .orderBy("user_id", "session_start"),
    Some(s"""
      WITH $EventsW, flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events_w
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

  /** Sliding windows (1 h / 15 min) through the streaming path —
    * q_window_sliding's epoch-grid oracle. */
  val streamSliding = QuerySpec(
    "q_stream_sliding",
    (s, d) => Replay.sliding(s, d)
      .orderBy("win_start", "event_type"),
    Some(s"""
      WITH $EventsW
      SELECT make_timestamp((epoch_us(ts)//900000000 - k.k)*900000000) AS win_start,
             event_type, count(*) AS n_events
      FROM events_w, (SELECT unnest([0,1,2,3]) AS k) k
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))

  /** dropDuplicatesWithinWatermark under ADVERSARIAL duplicates: every
    * third event is re-fed 2 minutes later (inside the watermark) as a
    * full copy — the state store must drop each one. Survivors = the
    * original events table exactly; a leaked duplicate adds a row with
    * a shifted ts and fails the count/hash gate. */
  val streamDedup = QuerySpec(
    "q_stream_dedup",
    (s, d) => Replay.dedup(s, d)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy("event_id"),
    Some(s"""
      WITH $EventsW
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
             value
      FROM events_w
      ORDER BY event_id
    """))

  /** [[streamDedup]] on the RocksDB state store — the dedup state keeps
    * one key per event id, the heaviest state-store population in the
    * family, so it is the second provider gate (q_stream_tumbling_rocksdb
    * covers the windowed-aggregation state shape). */
  val streamDedupRocksDb = QuerySpec(
    "q_stream_dedup_rocksdb",
    (s, d) => Replay.dedupRocksDb(s, d)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy("event_id"),
    Some(s"""
      WITH $EventsW
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
             value
      FROM events_w
      ORDER BY event_id
    """))

  /** The FILE-STREAMING source end-to-end (readStream.parquet over a
    * landing directory, one file per trigger) driving the same
    * watermarked tumbling aggregation — the production source path,
    * gated separately from the MemoryStream replays. Uncapped: the
    * slicing and writes are fully executor-side, so this twin is the
    * path that scales with SF. */
  val streamFile = QuerySpec(
    "q_stream_file",
    (s, d) => Replay.fileTumbling(s, d)
      .orderBy("hour_start", "event_type"),
    Some("""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      -- ts IS NOT NULL: the streaming window() excludes NULL event-time
      WHERE ts IS NOT NULL
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))

  /** flatMapGroupsWithState (append): per-user adjacent event-type
    * transition counts, where the one-event carried state must chain
    * pairs ACROSS micro-batch boundaries — the streaming twin of
    * q_event_transitions, same exact-integer matrix and conditional
    * probabilities. */
  val streamTransitions = QuerySpec(
    "q_stream_transitions",
    (s, d) => {
      val pairs = Replay.transitions(s, d)
      // window, not a join-back: a self-join of the memory-sink-derived
      // aggregate trips conflicting-reference resolution; the row-count
      // matrix is |types|² anyway, so the partition window is free
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("from_type")
      pairs.groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("from_total", sum("cnt").over(w))
        .select(col("from_type"), col("to_type"), col("cnt"),
          col("from_total"),
          (col("cnt").cast("double") / col("from_total").cast("double"))
            .as("p_cond"))
        .orderBy("from_type", "to_type")
    },
    Some(s"""
      WITH $EventsW, pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events_w
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

  /** flatMapGroupsWithState (UPDATE mode): per-user running totals whose
    * LAST emission must equal the batch aggregate. n_events is exact and
    * compared directly; the streamed double total (a per-user
    * (ts,event_id)-sorted sequential fold) is gated by an in-plan
    * verdict against the exact decimal sum (|Δ| ≤ 1e-6·n — sequential
    * float error over thousands of 2-decimal values is orders below
    * that), and the COMPARED total is the decimal one both engines
    * compute exactly (the q_similarity_ann verdict discipline). */
  val streamTotals = QuerySpec(
    "q_stream_totals",
    (s, d) => {
      val last = Replay.totals(s, d)
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("total_value"))).as("m"))
        .select(col("user_id"), col("m.n_events").as("n_events"),
          col("m.total_value").as("__streamed"))
      // batch side over the SAME capped corpus the stream replayed
      val exact = Replay.cappedEvents(s, d)
        .groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,2)")).as("__exact"))
      last.join(exact, "user_id")
        .select(col("user_id"), col("n_events"),
          col("__exact").cast("double").as("total_value"),
          (abs(col("__streamed") - col("__exact").cast("double")) <=
            col("n_events").cast("double") * 1e-6).cast("int")
            .as("totals_ok"))
        .orderBy("user_id")
    },
    Some(s"""
      WITH $EventsW
      SELECT user_id,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             1 AS totals_ok
      FROM events_w
      GROUP BY user_id
      ORDER BY user_id
    """))

  /** STREAM-STREAM interval join (two MemoryStreams fed in event-time
    * lockstep — Replay.joinClicksViews carries the two-source watermark
    * argument): each click pairs with the same user's views from the
    * preceding hour. The state store buffers BOTH sides and evicts by
    * watermark + the join's time bound; the oracle is the identical batch
    * join over the capped corpus, so a buffering/eviction/late-drop
    * defect is a hash mismatch. */
  val streamJoin = QuerySpec(
    "q_stream_join",
    (s, d) => Replay.joinClicksViews(s, d)
      .orderBy("click_id", "view_id"),
    Some(s"""
      WITH $EventsW,
      c AS (SELECT event_id AS click_id, user_id,
                   CAST(ts AS TIMESTAMP) AS click_ts
            FROM events_w WHERE event_type = 'click'),
      v AS (SELECT event_id AS view_id, user_id,
                   CAST(ts AS TIMESTAMP) AS view_ts
            FROM events_w WHERE event_type = 'view')
      SELECT click_id, view_id, user_id, click_ts, view_ts
      FROM c JOIN v USING (user_id)
      WHERE view_ts <= click_ts
        AND view_ts >= click_ts - INTERVAL 1 HOUR
      ORDER BY click_id, view_id
    """))

  /** STREAM-STATIC left-outer enrichment join: streamed events pick up
    * broadcast dimension columns (customer, filtered to one segment so
    * ~3/4 of the rows exercise the null/outer path). Stateless per
    * micro-batch — the production shape for enriching a 100 TB stream
    * against a profile store. */
  val streamEnrich = QuerySpec(
    "q_stream_enrich",
    (s, d) => Replay.enrich(s, d)
      .orderBy("event_id"),
    Some(s"""
      WITH $EventsW,
      dim AS (SELECT c_custkey, c_name, c_acctbal
              FROM customer WHERE c_mktsegment = 'BUILDING')
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
             value, c_name, c_acctbal
      FROM events_w LEFT JOIN dim ON user_id = c_custkey
      ORDER BY event_id
    """))

  val all: Seq[QuerySpec] = Seq(streamTumbling, streamTumblingRocksDb,
    streamSessions, streamSliding, streamDedup, streamDedupRocksDb,
    streamTransitions, streamTotals, streamFile, streamJoin, streamEnrich)
}
