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
}
