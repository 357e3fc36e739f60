package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense global ranks WITHOUT a global sort — the scale-form primitive
  * behind every "position in total order" operator (z-order tiling,
  * sorted-neighborhood dedup, exact global shuffles).
  *
  * A `Window.orderBy(...)` with no partition spec funnels every row
  * through ONE task: correct at sf0.1, dead at 100 TB. The distributed
  * replacement here computes the same rank with range BUCKETS whose
  * cutpoints are sampled once and embedded as plan literals (the same
  * bounds-as-literals move production z-order writers make):
  *
  *   1. a bounded, deterministic key-hash sample of the first sort
  *      column picks `nParts−1` cutpoints (layout-independent — same
  *      sample whatever the partitioning, the IVF-quantizer pattern);
  *   2. every row's bucket comes from a codegen'd binary-search CASE
  *      tree over those literal cutpoints — a pure expression, so every
  *      branch of the plan assigns identical buckets (a sampled
  *      `repartitionByRange` exchange would re-sample per branch and
  *      disagree);
  *   3. per-bucket counts → prefix-sum OFFSETS via a triangular
  *      broadcast join over ≤ nParts rows (no global window even here);
  *   4. `row_number` over `Window.partitionBy(bucket)` — partition-LOCAL
  *      — plus the bucket's offset.
  *
  * rank = offset(bucket) + local row_number: dense, 1-based, equal to
  * `row_number().over(Window.orderBy(sortCols))` bit-for-bit.
  *
  * Requirements: `sortCols` must be a TOTAL order (unique tiebreaker
  * last), all ascending; the FIRST sort column doubles as the bucket
  * key, so it should be high-cardinality — rows sharing one value of it
  * always land in one bucket (a single mega-hot key is the same skew a
  * range partitioner would suffer; pick the key accordingly).
  */
object Ranks {

  /** Append a dense 1-based global-rank column in `sortCols` order.
    * Internal columns are dropped; every input column is preserved.
    * Triggers THREE bounded driver-side jobs at build time (a count, a
    * ≤ 128·nParts-row cutpoint sample collect, and the eager per-bucket
    * counts materialization — the last is a full pass over `df`'s
    * upstream, so callers with expensive upstreams should materialize
    * their input first, as Dedup.sortedNeighborhood does).
    *
    * @param totalCol also append the total row count (constant column)
    *                 — rank-arithmetic consumers (ntile emulation) need
    *                 n without a second pass over the data.
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column], nParts: Int,
      rankCol: String, totalCol: Option[String] = None): DataFrame = {
    require(nParts > 0, s"nParts=$nParts must be positive")
    val bounds = sampleCutpoints(df, sortCols.head, nParts)
    val keyed = df.withColumn("__gr_bkt", bucketOf(sortCols.head, bounds))
    // counts MATERIALIZED (≤ nParts rows): it feeds the triangular join
    // twice (both sides) and the optional total — unmaterialized, each
    // consumer re-ran the full count aggregate over `df`'s upstream
    // chain (3 extra passes in the q_snm_dedup/q_zorder before-plans;
    // r11 optimization, rank values are materialization-invariant)
    val counts = Checkpoints.materialize(
      keyed.groupBy("__gr_bkt").agg(count(lit(1)).as("__gr_cnt")))
    // prefix sum over ≤ nParts rows: a triangular broadcast join instead
    // of a global window, so NO empty-partition-spec Window node exists
    // anywhere in the plan (PlanSpec asserts the absence outright)
    val below = counts.select(col("__gr_bkt").as("__gr_bbkt"),
      col("__gr_cnt").as("__gr_bcnt"))
    val offsets = counts
      .join(broadcast(below), col("__gr_bbkt") < col("__gr_bkt"), "left")
      .groupBy("__gr_bkt")
      .agg(coalesce(sum("__gr_bcnt"), lit(0L)).as("__gr_off"))
    val local = Window.partitionBy("__gr_bkt").orderBy(sortCols: _*)
    val ranked = keyed
      .join(broadcast(offsets), "__gr_bkt")
      .withColumn(rankCol, col("__gr_off") + row_number().over(local))
      .drop("__gr_bkt", "__gr_off")
    totalCol match {
      case None => ranked
      case Some(n) =>
        val total = counts.agg(coalesce(sum("__gr_cnt"), lit(0L)).as(n))
        ranked.crossJoin(broadcast(total))
    }
  }

  /** Append running (prefix) sums — and optionally the dense rank — over
    * the TOTAL `sortCols` order, with no empty-partition-spec Window
    * anywhere in the plan: [[globalRank]]'s cutpoint machinery
    * generalized from row counting to value accumulation. For each
    * `(outCol, valueCol)` in `cums` the output carries
    * `outCol = Σ valueCol` over every row at-or-before this one in
    * `sortCols` order — exactly `sum(valueCol).over(Window
    * .orderBy(sortCols).rowsBetween(unboundedPreceding, currentRow))`,
    * computed as per-bucket local running sums plus a triangular
    * broadcast prefix of the per-bucket totals.
    *
    * Value columns must be EXACT types (integral/decimal): their sums
    * re-associate losslessly, so the distributed form is bit-identical
    * to the single-partition window. Do NOT pass float/double values —
    * partial-sum re-association would change ulps. Same requirements as
    * [[globalRank]] otherwise (total order; high-cardinality first sort
    * column — see [[descCountKey]] for the rank-by-count shape). The
    * optional rank is LONG (offset arithmetic); consumers that pinned
    * `row_number()`'s INT cast it back at the call site. Same three
    * bounded build-time jobs as [[globalRank]]; materialize expensive
    * upstreams first. */
  def globalCumsum(df: DataFrame, sortCols: Seq[Column], nParts: Int,
      cums: Seq[(String, String)],
      rankCol: Option[String] = None): DataFrame = {
    require(nParts > 0, s"nParts=$nParts must be positive")
    require(cums.nonEmpty || rankCol.nonEmpty,
      "globalCumsum needs at least one cumulative column or a rank column")
    val bounds = sampleCutpoints(df, sortCols.head, nParts)
    val keyed = df.withColumn("__gr_bkt", bucketOf(sortCols.head, bounds))
    // per-bucket counts AND per-bucket value totals in ONE materialized
    // aggregate (≤ nParts rows): both sides of the triangular prefix join
    // read it — the globalRank counts-materialization discipline
    val aggs = count(lit(1)).as("__gr_cnt") +: cums.zipWithIndex.map {
      case ((_, v), i) => sum(col(v)).as(s"__gr_s$i") }
    val counts = Checkpoints.materialize(
      keyed.groupBy("__gr_bkt").agg(aggs.head, aggs.tail: _*))
    val below = counts.select((col("__gr_bkt").as("__gr_bbkt") +:
      col("__gr_cnt").as("__gr_bcnt") +:
      cums.indices.map(i => col(s"__gr_s$i").as(s"__gr_bs$i"))): _*)
    val offAggs = coalesce(sum("__gr_bcnt"), lit(0L)).as("__gr_off") +:
      cums.indices.map(i =>
        coalesce(sum(s"__gr_bs$i"), lit(0L)).as(s"__gr_off$i"))
    val offsets = counts
      .join(broadcast(below), col("__gr_bbkt") < col("__gr_bkt"), "left")
      .groupBy("__gr_bkt")
      .agg(offAggs.head, offAggs.tail: _*)
    val local = Window.partitionBy("__gr_bkt").orderBy(sortCols: _*)
    val localPre = local.rowsBetween(Window.unboundedPreceding, 0)
    val joined = keyed.join(broadcast(offsets), "__gr_bkt")
    val withRank = rankCol match {
      case Some(r) =>
        joined.withColumn(r, col("__gr_off") + row_number().over(local))
      case None => joined
    }
    val withCums = cums.zipWithIndex.foldLeft(withRank) {
      case (acc, ((out, v), i)) =>
        acc.withColumn(out, col(s"__gr_off$i") + sum(col(v)).over(localPre))
    }
    withCums.drop(("__gr_bkt" +: "__gr_off" +:
      cums.indices.map(i => s"__gr_off$i")): _*)
  }

  /** Order-embedding of `(cnt DESC, tok ASC)` into ONE string key whose
    * plain ascending order equals the pair order — what lets the
    * rank-by-frequency shape (vocabulary builds, coverage curves) ride
    * [[globalRank]]/[[globalCumsum]] with a HIGH-CARDINALITY bucket key:
    * bucketing on `cnt` alone would funnel the entire Zipf singleton
    * tail (every cnt = 1 type) into one bucket, which at web scale is
    * the same single-task skew the machinery exists to avoid.
    *
    * Encoding: `Long.MaxValue − cnt` as FIXED-WIDTH (16-char) lowercase
    * hex, then the token. Fixed width makes the numeric prefix compare
    * lexicographically as the number (hex digits 0-9a-f are
    * ASCII-ascending), the subtraction flips to descending, and the
    * appended token breaks count-ties in UTF-8 byte order — exactly
    * Spark's string `<` and the ASC tok tiebreak. Requires cnt ≥ 0. */
  def descCountKey(cnt: Column, tok: Column): Column =
    concat(format_string("%016x", lit(Long.MaxValue) - cnt), tok)

  /** `ntile(t)` from a dense 1-based rank and the total count — the exact
    * row-position semantics of the window function, as plain arithmetic:
    * the first `n mod t` tiles take `⌈n/t⌉` rows, the rest `⌊n/t⌋`.
    * With rank produced by [[globalRank]], this equals
    * `ntile(t).over(Window.orderBy(sortCols))` bit-for-bit — which is what
    * lets a range-partitioned plan keep a window-function oracle. */
  def ntileFromRank(rank: Column, n: Column, t: Int): Column = {
    // Column./ is DOUBLE division; exact floor-division instead: subtract
    // the remainder first so the quotient divides exactly (values here are
    // ≪ 2^53, so the double round-trip is lossless).
    def idiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")
    val q = idiv(n, lit(t.toLong))
    val r = (n % t).cast("long")
    val bigSpan = r * (q + lit(1L))       // rows covered by the ⌈·⌉ tiles
    // q = 0 (n < t) never reaches the otherwise-branch: bigSpan = n there,
    // and CaseWhen evaluates branches lazily, so no division by zero.
    when(rank <= bigSpan, idiv(rank - 1, q + lit(1L)) + 1)
      .otherwise(r + idiv(rank - bigSpan - 1, q) + 1)
      .cast("int")
  }

  /** `nParts−1` sorted cutpoint values of `key`, from a deterministic
    * bounded key-hash sample (never `.sample()`/`limit()` — those change
    * with layout). NULL keys are excluded: they sort first and therefore
    * always belong to bucket 0, which is where [[bucketOf]] sends them. */
  private[ops] def sampleCutpoints(df: DataFrame, key: Column,
      nParts: Int): IndexedSeq[Any] = {
    if (nParts == 1) return Vector.empty
    val keyOnly = df.select(key.as("__gr_k"))
    val n = keyOnly.count()
    val maxSample = 128L * nParts
    val sampled =
      if (n > maxSample) {
        // ceil + floor-of-1, as in ivfAssign: truncation would undershoot
        // and hit ZERO keep-rate on the huge corpora this exists for
        val keep = math.max(1L,
          math.ceil(maxSample.toDouble / n * 1000000L).toLong)
        keyOnly.filter(
          pmod(xxhash64(lit("rank-bounds"), col("__gr_k")), lit(1000000L))
            < keep)
      } else keyOnly
    val vals = sampled.collect().map(_.get(0)).filter(_ != null)
    val sorted: Array[Any] =
      if (vals.isEmpty) vals
      else vals.head match {
        case _: java.lang.Long => vals.sortBy(_.asInstanceOf[Long])
        case _: java.lang.Integer => vals.sortBy(_.asInstanceOf[Int])
        case _: java.lang.Double => vals.sortBy(_.asInstanceOf[Double])
        case _: java.lang.Float => vals.sortBy(_.asInstanceOf[Float])
        case _: String =>
          // Spark compares strings as UTF-8 BYTES; JVM String ordering is
          // UTF-16 — sort with Spark's own comparator so cutpoints agree
          // with the engine's > on non-ASCII too
          vals.sortWith((a, b) =>
            org.apache.spark.unsafe.types.UTF8String
              .fromString(a.asInstanceOf[String])
              .compareTo(org.apache.spark.unsafe.types.UTF8String
                .fromString(b.asInstanceOf[String])) < 0)
        case other => throw new IllegalArgumentException(
          s"unsupported bucket-key type ${other.getClass.getName} — " +
            "use a long/int/double/float/string sort key")
      }
    val m = sorted.length
    if (m == 0) Vector.empty
    else (1 until nParts).map(i => sorted(((i.toLong * m) / nParts).toInt
      .min(m - 1)))
  }

  /** Bucket index = #{cutpoints c | key > c}, as a BALANCED nested-CASE
    * binary search over literal bounds: log₂(nParts) codegen'd compares
    * per row, no interpreted HOF in the hot path. NULL keys take every
    * otherwise-branch and land in bucket 0 — consistent with
    * NULLS FIRST ascending order. Equal keys always share a bucket, so
    * bucket order extends the sort order. */
  private[ops] def bucketOf(key: Column, bounds: IndexedSeq[Any]): Column = {
    def go(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(key > lit(bounds(mid)), go(mid + 1, hi)).otherwise(go(lo, mid))
      }
    go(0, bounds.length)
  }
}
