package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence operators over event streams: gaps-and-islands
  * streaks, Markov transition counts, and spine-based gap filling with
  * last-observation-carried-forward. The reference's dataflow is purely
  * relational, so these are extension operators in the SURVEY §2b spirit
  * (the event-sequence analyses a 100 TB activity log actually runs).
  *
  * Scale notes: every operator here shuffles ONCE on the entity key and
  * reuses that partitioning for its windows — the per-key sequences are
  * bounded (a user's events, a key's days), never the table. Nothing
  * collects to the driver.
  */
object Series {

  /** Gaps-and-islands: per key, consecutive-day activity streaks from an
    * event timestamp. The classic anchor trick — `day − row_number()` is
    * constant within a run of consecutive distinct days — turns streak
    * detection into one groupBy, no self-join, no iteration.
    *
    * Returns one row per key: active-day count, streak count, and the
    * longest streak in days. One shuffle on the key; the distinct, both
    * windows, and the final aggregate all reuse it. */
  def dailyStreaks(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    // ONE shuffle on the key up front: clustering by keyCol alone
    // satisfies the distinct's (key, day) grouping, the window's
    // partitionBy, and both downstream aggregates — without it Catalyst
    // plans a (key, day) exchange for the distinct and a second (key)
    // exchange for the window
    val days = events
      .repartition(col(keyCol))
      .select(col(keyCol), to_date(col(tsCol)).as("__day"))
      .distinct()
    val w = Window.partitionBy(keyCol).orderBy("__day")
    days
      .withColumn("__anchor", date_sub(col("__day"), row_number().over(w)))
      .groupBy(col(keyCol), col("__anchor"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(keyCol)
      .agg(
        sum(col("__len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_streak"))
  }

  /** First-order Markov transition estimate over per-key event sequences:
    * count of each (from_type → to_type) adjacent pair, the from-type's
    * outgoing total, and the conditional probability cnt/total (one IEEE
    * division of exact integer counts — engine-portable; per from-type
    * the distribution sums to exactly 1).
    *
    * The sequence order is (ts, tiebreak) within the key — the tiebreak
    * makes equal-timestamp runs deterministic. The lead() window and
    * nothing else touches the full table; the transition matrix itself is
    * |types|² rows, trivially small at any scale. */
  def transitions(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tiebreak))
    val pairs = events
      .select(col(keyCol), col(tsCol), col(tiebreak),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy("from_type")
      .agg(sum(col("cnt")).as("from_total"))
    pairs.join(totals, "from_type")
      .withColumn("p_cond",
        col("cnt").cast("double") / col("from_total").cast("double"))
  }

  /** Daily gap filling with last-observation-carried-forward: per key,
    * one row per calendar day from the key's first to last observation,
    * carrying the day's LAST observed value (ties broken by `tiebreak`)
    * forward across unobserved days — the resampling step that turns an
    * irregular event stream into an aligned daily series.
    *
    * Values are COPIED, never summed, so doubles stay bit-identical
    * across engines. The spine explodes per key (bounded by the key's
    * own date span); the LOCF window reuses the same key partitioning.
    * At 100 TB the spine is date-bounded (days × keys), orders of
    * magnitude smaller than the event table it summarizes. */
  def gapFillDaily(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tiebreak: String): DataFrame = {
    val perDay = events
      .select(col(keyCol), to_date(col(tsCol)).as("day"),
        col(valueCol).as("__v"), col(tsCol).as("__ts"), col(tiebreak))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("day"))
          .orderBy(col("__ts").desc, col(tiebreak).desc)))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("day"), col("__v").as("observed"))
    val spine = events
      .groupBy(keyCol)
      .agg(min(to_date(col(tsCol))).as("__d0"),
        max(to_date(col(tsCol))).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(perDay, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        last(col("observed"), ignoreNulls = true).over(w).as("value"),
        col("observed").isNotNull.cast("int").as("is_observed"))
  }

  /** Lag-k autocorrelation, k = 1..maxLag, over a (t, x) series with an
    * integer time index — Pearson correlation of the matched pairs
    * (x_t, x_{t+k}), the series-diagnostics primitive (seasonality
    * detection, residual whiteness checks) in its gap-tolerant form:
    * pairs exist only where BOTH endpoints do, so a holey series never
    * fabricates a lag.
    *
    * Shape: ONE self-equi-join on the time index (the lag side explodes
    * each row into its maxLag shifted probes), then per-lag decimal
    * sufficient statistics — the [[olsFit]]/q_corr discipline: sums
    * accumulate exactly, and the correlation is a fixed IEEE sequence
    * over those exact sums, rounded to 6 places at the boundary. The
    * joined frame is series-sized (calendar-bounded after upstream
    * aggregation), never corpus-sized.
    *
    * Output: (lag, n_pairs, acf), one row per lag with ≥ 2 pairs and
    * nonzero variance on both legs (degenerate lags → NULL acf). */
  def autocorr(series: DataFrame, tCol: String, xCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag=$maxLag must be at least 1")
    val base = series.select(col(tCol).cast("long").as("t"),
      col(xCol).cast("double").as("x"))
    val probes = base.select(col("t"), col("x"),
        explode(array((1 to maxLag).map(lit(_)): _*)).as("lag"))
      .select((col("t") - col("lag")).as("t0"), col("lag"), col("x").as("y"))
    val pairs = base.select(col("t").as("t0"), col("x")).join(probes, "t0")
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,18)")).cast("double")
    pairs.groupBy("lag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x") * col("x")).as("sxx"),
        dsum(col("y") * col("y")).as("syy"),
        dsum(col("x") * col("y")).as("sxy"))
      .select(col("lag"), col("n").cast("long").as("n_pairs"),
        when(
          col("n") * col("sxx") - col("sx") * col("sx") =!= 0.0 &&
            col("n") * col("syy") - col("sy") * col("sy") =!= 0.0,
          round(
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6))
          .as("acf"))
  }

  /** CUSUM changepoint locator over a (t, v) series with EXACT integer
    * values (callers pre-scale, e.g. cents): the split point maximizing
    * |n·P_i − i·T| — the classic cumulative-deviation statistic
    * n·Σ_{≤i}(v − mean) kept in integers by multiplying the mean out
    * (P_i = prefix sum, T = total), so the argmax is exact and
    * replayable on any engine. Ties break to the earliest t.
    *
    * The prefix sum is ONE window over the series — which is legitimate
    * at 100 TB only because the input is an upstream AGGREGATE whose
    * length is calendar-bounded (days), not data-bounded; feeding raw
    * events through this is the global-window anti-pattern this repo
    * bans. Row magnitude bound: n·|T| must stay inside int64 — 2⁶³ ≈
    * 9·10¹⁸ covers centuries of daily cents at 10¹²/day.
    *
    * Output: ONE row (t, idx, n, g_stat, direction): the 1-based split
    * index, the statistic, and +1/−1 for step-up/step-down after t. */
  def cusumChangepoint(series: DataFrame, tCol: String, vCol: String): DataFrame = {
    val base = series.select(col(tCol).cast("long").as("t"),
      col(vCol).cast("long").as("v"))
    // asc_nulls_last: an unknown time sorts AFTER every known one (the
    // SQL-standard/DuckDB ASC order); Spark's NULLS-FIRST default would
    // seat a NULL-day aggregate at prefix position 1 (hollow DegenGate)
    val wOrd = Window.orderBy(col("t").asc_nulls_last)
    val tot = base.agg(sum("v").as("tv"), count(lit(1)).as("n"))
    base
      .withColumn("idx", row_number().over(wOrd))
      .withColumn("p",
        sum("v").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .select(col("t"), col("idx"), col("n"),
        (col("n") * col("p") - col("idx") * col("tv")).as("dev"))
      .select(col("t"), col("idx"), col("n"), abs(col("dev")).as("g_stat"),
        // dev < 0 ⇔ prefix mean below global mean ⇔ the series steps UP
        when(col("dev") < 0, lit(1)).otherwise(lit(-1)).as("direction"))
      // asc_nulls_last tie-break too: a zero-revenue tie between a dated
      // day and the unknown-day row must resolve to the DATED day, as
      // DuckDB's ASC does (hollow DegenGate)
      .orderBy(col("g_stat").desc, col("t").asc_nulls_last)
      .limit(1)
  }

  /** Kaplan–Meier survival estimator over (duration, event) rows —
    * durations in integer units, event = 1 observed / 0 right-censored.
    * S(t) = Π_{eventTimes t_j ≤ t} (1 − d_j / n_j), with n_j the at-risk
    * count (all subjects with duration ≥ t_j, censored included) and d_j
    * the events AT t_j — the product-limit form that handles censoring
    * correctly, which a naive "fraction surviving" rollup does not.
    *
    * Determinism: the running product is a LEFT FOLD over factors sorted
    * by event time — a fixed IEEE sequence starting at 1.0 (1.0·f ≡ f,
    * so an engine folding without the seed produces bit-identical
    * values). The per-time aggregate is map-side combinable; the two
    * ordered windows (risk prefix, product fold) run over the DISTINCT-
    * duration frame, which is bounded by the time horizon in units, not
    * by subjects — the q_cusum calendar-bounded contract. Fold buffer =
    * event-time count; if the horizon itself is unbounded, pre-bucket
    * durations (daily → weekly) before calling.
    *
    * Output: (t, n_risk, n_events, surv) per distinct EVENT time,
    * ascending. */
  def kaplanMeier(subjects: DataFrame, durCol: String, eventCol: String): DataFrame = {
    // NULL-duration subjects are EXCLUDED: a subject with an unknown
    // duration has no place on the time axis — it can neither sit in a
    // risk set nor contribute an event (hollow DegenGate contract; the
    // oracle carries the same t IS NOT NULL predicate)
    val base = subjects.select(col(durCol).cast("long").as("t"),
      col(eventCol).cast("int").as("ev"))
      .filter(col("t").isNotNull)
    val byT = base.groupBy("t").agg(
      sum(col("ev").cast("long")).as("d"), count(lit(1)).as("c"))
    val tot = base.agg(count(lit(1)).as("n_total"))
    val wPre = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    byT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_total") - sum("c").over(wPre) + col("c"))
      .filter(col("d") > 0)
      .withColumn("f",
        lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
      .withColumn("surv",
        aggregate(
          array_sort(collect_list(struct(col("t").as("t"), col("f").as("f")))
            .over(wPre)),
          lit(1.0), (acc, x) => acc * x.getField("f")))
      .select(col("t"), col("n_risk"), col("d").as("n_events"), col("surv"))
  }

  /** Exact-integer ordinary least squares over an (x, y) integer series:
    * all five sufficient statistics (n, Σx, Σy, Σxy, Σx², plus Σy² for
    * r²) accumulate as exact longs in ONE map-side-combinable aggregate;
    * slope, intercept, and r² are then a fixed sequence of IEEE double
    * ops on those exact integers — bit-identical on any engine and any
    * partitioning, unlike a naive avg-of-doubles regression whose result
    * moves with the reduction order. */
  def olsFit(xy: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    xy.agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"),
        sum(y).as("sy"),
        sum(x * y).as("sxy"),
        sum(x * x).as("sxx"),
        sum(y * y).as("syy"))
      .select(
        col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("denx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("deny"),
        col("sx"), col("sy"))
      .select(
        col("n"),
        // zero-variance guard: constant x (denx=0) has no defined slope —
        // return NULL, never NaN/Infinity (the Text.ratio / CosineSim
        // convention: degenerate input → SQL NULL, which composes)
        when(col("denx") =!= 0,
          col("num").cast("double") / col("denx").cast("double"))
          .as("slope"),
        col("sx"), col("sy"), col("num"), col("denx"), col("deny"))
      .select(
        col("n"),
        col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double")).as("intercept"),
        when(col("denx") =!= 0 && col("deny") =!= 0,
          (col("num").cast("double") * col("num").cast("double"))
            / (col("denx").cast("double") * col("deny").cast("double")))
          .as("r2"))
  }
}
