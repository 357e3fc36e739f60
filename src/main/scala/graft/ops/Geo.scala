package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Planar spatial operators over integer-scaled coordinates — the grid-file
  * (fixed-grid) partition join from the spatial-join literature, the same
  * blocking idea the dedup suite uses for LSH banding applied to geometry.
  *
  * The reference's flagship output is a station MAP (map_tutorial.html:48-71
  * plots per-station snowfall at lat/lon); these operators supply the spatial
  * queries such a map pipeline needs at scale: density rollups per grid cell,
  * radius joins ("stations within 20 km"), and radius-bounded kNN — without
  * ever forming the all-pairs product.
  *
  * Contract: callers provide a frame with BIGINT columns `key`, `x`, `y`
  * (coordinates pre-scaled to integers — micro-degrees, metres, whatever —
  * so every distance is EXACT int64 arithmetic, portable to any oracle; no
  * trig, no IEEE drift). Distances are squared Euclidean in those units.
  *
  * Scale shape (100 TB): one shuffle on (cell_x, cell_y); candidate work is
  * Σ_cells 9·|A∩cell|·|B∩cell| — bounded by the data's spatial density, never
  * n². Pick `cellSize` from the target radius (the 3×3 cover needs
  * radius ≤ cellSize; much larger wastes candidates). Dense-city cell skew is
  * ordinary join-key skew: AQE skew-join splits it, or sub-split hot cells by
  * hashing the probe side (the q_skew_join salting precedent).
  */
object Geo {

  private def withCells(df: DataFrame, cellSize: Long): DataFrame =
    df.withColumn("cell_x", expr(s"x DIV ${cellSize}L"))
      .withColumn("cell_y", expr(s"y DIV ${cellSize}L"))

  /** All pairs within `radius` (squared-Euclidean), via 3×3 neighbor-cell
    * blocking. Build side keeps its home cell; probe side replicates each
    * point to its home cell plus the 8 surrounding cells, so a qualifying
    * pair meets in EXACTLY one cell (the build point's home) — no
    * post-join dedup needed. Coverage is exact, not approximate: dist ≤
    * radius ≤ cellSize forces |cell delta| ≤ 1 per axis.
    *
    * `ordered=false` → each unordered pair once (key_a < key_b);
    * `ordered=true` → both directions (key_a ≠ key_b), the kNN feed.
    * Output: key_a, key_b, dist2 (all BIGINT). */
  def neighborPairs(points: DataFrame, cellSize: Long, radius: Long,
      ordered: Boolean = false): DataFrame = {
    val keyPred =
      if (ordered) col("key_a") =!= col("key_b") else col("key_a") < col("key_b")
    blockedJoin(points, points, cellSize, radius, keyPred)
  }

  /** Radius join across TWO point sets (e.g. every customer to the
    * suppliers within reach) — same one-meeting-cell guarantee, no key
    * predicate: the sides are distinct relations, so every qualifying
    * (left, right) pair appears exactly once. */
  def bipartitePairs(left: DataFrame, right: DataFrame, cellSize: Long,
      radius: Long): DataFrame =
    blockedJoin(left, right, cellSize, radius, lit(true))

  /** Per left-side point, the single nearest right-side point within
    * `radius` (ties broken by key_b) — the "nearest station / nearest
    * supplier" assignment. Left points with nothing in range are absent,
    * not null-padded. */
  def nearestNeighbor(left: DataFrame, right: DataFrame, cellSize: Long,
      radius: Long): DataFrame = {
    val w = Window.partitionBy("key_a").orderBy(col("dist2"), col("key_b"))
    bipartitePairs(left, right, cellSize, radius)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("key_a", "key_b", "dist2")
  }

  private def blockedJoin(left: DataFrame, right: DataFrame, cellSize: Long,
      radius: Long, keyPred: org.apache.spark.sql.Column): DataFrame = {
    require(radius > 0 && cellSize >= radius,
      s"3x3 neighbor cover needs 0 < radius <= cellSize, " +
        s"got radius=$radius cellSize=$cellSize")
    val build = withCells(left, cellSize).select(
      col("key").as("key_a"), col("x").as("xa"), col("y").as("ya"),
      col("cell_x"), col("cell_y"))
    // One top-level generator (Spark bans nested/expression-wrapped
    // generators): explode the 9 (dx, dy) offsets, then shift the home cell.
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probe = withCells(right, cellSize)
      .select(col("key").as("key_b"), col("x").as("xb"), col("y").as("yb"),
        col("cell_x"), col("cell_y"), explode(offsets).as("off"))
      .select(col("key_b"), col("xb"), col("yb"),
        (col("cell_x") + col("off.dx")).as("cell_x"),
        (col("cell_y") + col("off.dy")).as("cell_y"))
    val dist2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    build.join(probe, Seq("cell_x", "cell_y"))
      .where(keyPred && dist2 <= lit(radius * radius))
      .select(col("key_a"), col("key_b"), dist2.as("dist2"))
  }

  /** Radius-bounded k-nearest-neighbors: for every point, the k nearest
    * OTHER points within `radius`, ranked by (dist2, key_b) for a total
    * order. Honest scoping: a point whose true NN is farther than `radius`
    * reports fewer than k rows — unbounded kNN would need an all-pairs
    * fallback that cannot ship at 100 TB. The per-key window buffer is
    * density-bounded (≈ density·π·radius²), not data-bounded. */
  def radiusKnn(points: DataFrame, cellSize: Long, radius: Long,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy("key_a").orderBy(col("dist2"), col("key_b"))
    neighborPairs(points, cellSize, radius, ordered = true)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("key_a", "rank", "key_b", "dist2")
  }

  /** Density rollup per grid cell — the map pipeline's heat layer. One
    * map-side-combinable aggregate, one shuffle; every output is exact
    * int64 (counts and key extrema/sums, never order-summed doubles). */
  def gridAggregate(points: DataFrame, cellSize: Long): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    withCells(points, cellSize)
      .groupBy("cell_x", "cell_y")
      .agg(count(lit(1)).as("n_points"), min("key").as("min_key"),
        max("key").as("max_key"), sum("key").as("sum_key"))
  }
}
