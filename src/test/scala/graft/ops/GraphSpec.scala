package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("bfsHops: min hops on a path graph, capped at maxHops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.bfsHops(edges, "a", "b", seeds, "id", maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)) // 5 is beyond the cap
  }

  test("bfsHops: undirected, multiple seeds take the nearer one, cycles safe") {
    // triangle 1-2-3 plus a pendant 3-4; seeds at both ends
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val seeds = Seq(1L, 4L).toDF("id")
    val got = Graph.bfsHops(edges, "a", "b", seeds, "id", maxHops = 6)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 1))
  }

  test("bfsHops: early-exits when the frontier empties (isolated component)") {
    val edges = Seq((1L, 2L), (10L, 11L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.bfsHops(edges, "a", "b", seeds, "id", maxHops = 20)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1)) // the 10–11 component is unreached
  }

  test("pageRank: mass conserves, symmetry respected, hub ranks highest") {
    // star: 1 is the hub of 2,3,4 plus a 2–3 chord; no dangling nodes
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("a", "b")
    val r = Graph.pageRank(edges, "a", "b", iters = 5)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // degrees: 1→3, 2→2, 3→2, 4→1
    assert(r.map(x => x._1 -> x._2).toMap ===
      Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // no dangling mass → ranks sum to exactly 1 (up to fold rounding)
    assert(math.abs(r.map(_._3).sum - 1.0) < 1e-12)
    // nodes 2 and 3 are structurally identical → identical rank
    val byId = r.map(x => x._1 -> x._3).toMap
    assert(byId(2L) === byId(3L))
    assert(byId(1L) > byId(2L) && byId(2L) > byId(4L))
  }

  test("pageRank: two-node graph stays uniform at any iteration count") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val r = Graph.pageRank(edges, "a", "b", iters = 4)
      .as[(Long, Long, Double)].collect()
      .map { case (i, _, rk) => i -> rk }.toMap
    assert(math.abs(r(1L) - 0.5) < 1e-15)
    assert(math.abs(r(2L) - 0.5) < 1e-15)
  }
}
