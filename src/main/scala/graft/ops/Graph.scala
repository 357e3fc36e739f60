package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames (the dedup /
  * lineage / co-occurrence graphs a data pipeline produces). Joins-on-
  * edge-lists is the Spark-native shape: every round is an equi-join +
  * aggregate over the (corpus-small) graph, never the corpus itself.
  * The connected-components sibling lives in [[Dedup.components]].
  */
object Graph {

  /** Min-hop BFS from `seeds` over an undirected edge list — frontier
    * style: round h joins ONLY the hop-(h−1) frontier against the edges,
    * so total work is O(Σ frontier-adjacent edges), not O(rounds × V).
    * That is the textbook Pregel work bound expressed as DataFrame joins;
    * at 100 TB the edges frame hash-partitions on `src` once (`.cache()`
    * keeps the partitioning) and every round's join reuses that layout.
    *
    * Iterative-DataFrame discipline (same as [[Dedup.components]]): each
    * round `localCheckpoint`s, truncating the nested-plan lineage that
    * would otherwise make driver-side analysis cost grow with the round
    * count. Early-exits when a frontier empties.
    *
    * Returns (id, hops) for every node within `maxHops` of a seed —
    * seeds included at hop 0. */
  def bfsHops(edges: DataFrame, aCol: String, bCol: String,
      seeds: DataFrame, idCol: String, maxHops: Int): DataFrame = {
    val fwd = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
    val und = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    var visited = seeds.select(col(idCol).cast("long").as("id"))
      .distinct()
      .withColumn("hops", lit(0))
      .localCheckpoint()
    var frontier = visited.select("id")
    var hop = 1
    var frontierSize = frontier.count()
    while (frontierSize > 0 && hop <= maxHops) {
      val next = und
        .join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id"))
        .distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint() // materialize ONCE: the count below and the
                           // next round's anti-join both read this frame
      // one count per round over the (tiny) frontier — the convergence
      // probe, not a data-path collect
      frontierSize = next.count()
      // both sides are checkpointed scans, so the union's plan depth grows
      // linearly with rounds (bounded by maxHops), never nests
      visited = visited.union(next)
      frontier = next.select("id")
      hop += 1
    }
    und.unpersist()
    visited
  }

  /** PageRank over an undirected edge list, fixed iteration count —
    * r ← (1−d)/N + d·Σ_in r(u)/deg(u). Each round is one edge join + one
    * aggregate over the graph (never the corpus); lineage truncates per
    * round with localCheckpoint, as in [[bfsHops]]. Undirected degree =
    * out-degree, and every node has an in-neighbor, so there is no
    * dangling-mass term.
    *
    * Determinism contract: every contribution sum is a fixed IEEE
    * sequence any engine replays — a partition-order `sum(double)` would
    * drift in the last ulp and compound across iterations. The sequence
    * is a TWO-LEVEL sorted-segment fold: contributions get a
    * deterministic position per node (row_number by (c, src) — a
    * partitioned, spill-safe window), segments of `segSize` positions
    * fold sorted lists (buffer ≤ segSize), and the segment sums fold in
    * segment order (buffer ≤ ⌈maxDeg/segSize⌉). A single-level
    * `aggregate(array_sort(collect_list(…)))` needs the WHOLE in-neighbor
    * list in one aggregation buffer — on a power-law graph, a
    * single-hot-key OOM; with segSize ≈ √maxDeg both levels stay small
    * no matter how hot the node.
    *
    * Returns (id, deg, rank) for every node. */
  def pageRank(edges: DataFrame, aCol: String, bCol: String,
      iters: Int, damping: Double = 0.85, segSize: Int = 1 << 16): DataFrame = {
    require(segSize >= 2, s"segSize=$segSize must be at least 2")
    val fwd = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
    // distinct() like bfsHops: a duplicate edge or a (b,a) mirror in the
    // input would otherwise double-count adjacencies — wrong degrees and
    // ranks with no error. One extra shuffle on the (small) edge list
    // buys input-shape robustness; for dup-free a<b input it's a no-op.
    val und = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    val deg = und.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
      .cache()
    val n = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(broadcast(n))
      .select(col("id"), col("deg"), (lit(1.0) / col("n")).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = und
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"),
          col("src"))
      // (c, src) is a total order per node (src unique among in-neighbors)
      val pos = contrib.withColumn("__rn", row_number().over(
        Window.partitionBy("id").orderBy(col("c"), col("src"))))
      val segSums = pos
        .groupBy(col("id"),
          (((col("__rn") - 1 - ((col("__rn") - 1) % segSize)) / segSize))
            .cast("long").as("__seg"))
        .agg(aggregate(array_sort(collect_list(col("c"))),
          lit(0.0), (acc, x) => acc + x).as("s"))
      val sums = segSums.groupBy("id")
        .agg(aggregate(
          array_sort(collect_list(struct(col("__seg").as("seg"),
            col("s").as("s")))),
          lit(0.0), (acc, x) => acc + x.getField("s")).as("s"))
      ranks = deg.crossJoin(broadcast(n))
        .join(sums, Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    // ranks is checkpoint-materialized, so the edge/degree caches can go
    // (same discipline as bfsHops — don't leak session cache entries)
    und.unpersist()
    deg.unpersist()
    ranks
  }
}
