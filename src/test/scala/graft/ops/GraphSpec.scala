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

  test("ssspBounded: weighted min-plus distances, hop bound binds, lighter multi-hop wins") {
    // 1-2-3 light chain vs a heavy 1-3 chord; pendant 3-4; isolated 9-10
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 1L),
      (9L, 10L, 2L)).toDF("a", "b", "w")
    val seeds = Seq(1L).toDF("id")
    def run(k: Int) =
      Graph.ssspBounded(edges, "a", "b", "w", seeds, "id", maxHops = k)
        .as[(Long, Long)].collect().toMap
    // 2 hops: node 3 takes the light 2-hop path (2), node 4 only via the
    // heavy chord (5+1); 3 hops: node 4 improves to 1+1+1
    assert(run(2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 6L))
    assert(run(3) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // generous bound changes nothing once converged (early exit)
    assert(run(20) === run(3))
  }

  test("ssspBounded: parallel edges keep the lighter; multiple seeds take the nearer") {
    val edges = Seq((1L, 2L, 9L), (1L, 2L, 3L), (2L, 3L, 1L)).toDF("a", "b", "w")
    val seeds = Seq(1L, 3L).toDF("id")
    val got = Graph.ssspBounded(edges, "a", "b", "w", seeds, "id", maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 3L -> 0L, 2L -> 1L))
  }

  test("ssspBounded equals brute-force bounded Bellman-Ford on random graphs") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 8) {
      val n = 2 + rnd.nextInt(18)
      val edges = (1 to (n * 2)).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, 1L + rnd.nextInt(9))
      }.filter(e => e._1 != e._2)
      val k = 1 + rnd.nextInt(5)
      val seeds = (0 until n).filter(_ % 3 == 0).map(_.toLong)
      if (edges.nonEmpty && seeds.nonEmpty) {
        val got = Graph.ssspBounded(edges.toDF("a", "b", "w"), "a", "b", "w",
            seeds.toDF("id"), "id", maxHops = k)
          .as[(Long, Long)].collect().toMap
        // reference: k rounds of full relaxation over the undirected edges
        val und = edges.flatMap(e => Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
        var dist = seeds.map(_ -> 0L).toMap
        for (_ <- 1 to k) {
          val relax = und.flatMap { case (s, t, w) =>
            dist.get(s).map(ds => t -> (ds + w))
          }
          dist = (dist.toSeq ++ relax).groupBy(_._1)
            .map { case (id, ds) => id -> ds.map(_._2).min }
        }
        assert(got === dist, s"n=$n k=$k edges=$edges")
      }
    }
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

  test("pageRank: segment fold is partition-invariant and segSize-stable at oracle precision") {
    // random power-law-ish graph: a handful of hubs (every node attaches
    // to a random low id) → hot in-neighbor lists, the case the bounded
    // segment fold exists for
    val rnd = new scala.util.Random(23)
    val edges = (2L to 120L).flatMap { v =>
      val hub = 1L + rnd.nextInt(math.max(1, (v / 10).toInt))
      val extra = 1L + rnd.nextInt((v - 1).toInt)
      Seq((math.min(hub, v), math.max(hub, v)),
        (math.min(extra, v), math.max(extra, v)))
    }.distinct.filter(e => e._1 != e._2).toDF("a", "b")
    def run(df: org.apache.spark.sql.DataFrame, segSize: Int) =
      Graph.pageRank(df, "a", "b", iters = 3, segSize = segSize)
        .select(col("id"), round(col("rank"), 9).as("r"))
        .as[(Long, Double)].collect().toMap
    // bitwise determinism across physical layouts: the fixed fold
    // sequence may not depend on partitioning
    val base = Graph.pageRank(edges, "a", "b", iters = 3, segSize = 4)
      .select(col("id"), col("rank")).as[(Long, Double)].collect().toMap
    val shuffled = Graph.pageRank(edges.repartition(13), "a", "b",
        iters = 3, segSize = 4)
      .select(col("id"), col("rank")).as[(Long, Double)].collect().toMap
    assert(base === shuffled) // EXACT doubles, no tolerance
    // different segment sizes reassociate the float sum — identical at
    // the 1e-9 precision the query emits (ulp-level drift only)
    val seg4 = run(edges, 4)
    val segBig = run(edges, 1 << 16)
    assert(seg4.keySet === segBig.keySet)
    seg4.foreach { case (id, r) =>
      assert(math.abs(r - segBig(id)) < 1e-9, s"node $id: $r vs ${segBig(id)}")
    }
    // mass still conserves through the two-level fold
    assert(math.abs(seg4.values.sum - 1.0) < 1e-9)
  }

  test("twoStarComponents: equals min-label components on random graphs") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 25
      // sparse random graph: ~n edges → a mix of multi-node components,
      // chains, and isolated pairs, across several density regimes
      val raw = (1 to n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }
      // include self-pairs and mirrored duplicates: normalization fodder
      val pairs = (raw ++ raw.take(5).map(_.swap) ++ Seq((7L, 7L)))
        .toDF("id_a", "id_b")
      val viaLabels = Dedup.components(
          pairs.filter(col("id_a") =!= col("id_b")), "id_a", "id_b",
          maxIter = 200)
        .as[(Long, Long)].collect().toMap
      val (labels, _) = Graph.twoStarComponents(pairs, "id_a", "id_b")
      val viaStars = labels.as[(Long, Long)].collect().toMap
      assert(viaStars === viaLabels, s"trial $trial diverged")
    }
  }

  test("twoStarComponents: O(log n) rounds on a path where min-label needs O(n)") {
    // a 96-node chain: min-label propagation moves the root label one
    // hop per round (components(maxIter=90) would still be unconverged);
    // star contraction halves path lengths per alternation
    val path = (0L until 95L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Graph.twoStarComponents(path, "id_a", "id_b")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size === 96)
    assert(got.values.forall(_ == 0L)) // one component, min-id rep
    assert(rounds <= 12, s"expected O(log n) alternations, got $rounds")
    // the sibling really is O(diameter): the same chain must refuse at a
    // round budget far above the two-star count
    intercept[IllegalArgumentException] {
      Dedup.components(path, "id_a", "id_b", maxIter = 40).collect()
    }
  }

  test("twoStarComponents: empty pair set yields empty labels, zero rounds") {
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val (labels, rounds) = Graph.twoStarComponents(none, "id_a", "id_b")
    assert(labels.isEmpty)
    assert(rounds === 0)
  }

  test("kCore: triangle survives a 2-core peel, the dangling chain does not") {
    // triangle 1-2-3 plus tail 3-4-5: peeling 5 (deg 1) exposes 4, then
    // 4 exposes nothing more — a two-round cascade the fixpoint must ride
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val core = Graph.kCore(pairs, "id_a", "id_b", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the densest subgraph: empty core, still converged
    assert(Graph.kCore(pairs, "id_a", "id_b", k = 3).isEmpty)
  }

  test("kCore equals a sequential peel on random graphs; every core degree >= k") {
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 3; k <- Seq(2, 3)) {
      val n = 40 + trial * 30
      val pairs = (1 to 2 * n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val got = Graph.kCore(pairs.toDF("id_a", "id_b"), "id_a", "id_b", k)
        .as[(Long, Long)].collect().toMap
      // driver-local reference peel over the same normalized edge set
      var edges = pairs.collect { case (x, y) if x != y =>
        (math.min(x, y), math.max(x, y))
      }.toSet
      var changed = true
      while (changed) {
        val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (v, xs) => v -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => keep(e._1) && keep(e._2))
        changed = next != edges
        edges = next
      }
      val want = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      assert(got === want, s"trial $trial k=$k")
      got.values.foreach(d => assert(d >= k))
    }
  }

  /** Driver-side replay of the pinned LPA rules: synchronous update,
    * neighbor votes + one self-vote, ties to the smallest label. */
  private def bruteLpa(edges: Set[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2).filter(_ != u) }
    var lab = nbrs.keys.map(u => u -> u).toMap
    for (_ <- 1 to rounds) {
      lab = nbrs.map { case (u, ns) =>
        val votes = (ns.toSeq.map(lab) :+ lab(u))
          .groupBy(identity).map { case (l, xs) => l -> xs.size }
        u -> votes.toSeq.minBy { case (l, n) => (-n, l) }._1
      }
    }
    lab
  }

  test("labelPropagation equals the pinned-rule reference on random graphs") {
    val rnd = new scala.util.Random(91)
    for (trial <- 1 to 4; rounds <- Seq(1, 2, 3)) {
      val n = 20 + trial * 15
      val edges = (1 to n * 2).map { _ =>
        val u = rnd.nextInt(n).toLong; val v = rnd.nextInt(n).toLong
        (math.min(u, v), math.max(u, v))
      }.filter(e => e._1 != e._2).toSet
      val got = Graph.labelPropagation(edges.toSeq.toDF("a", "b"), "a", "b",
        rounds).as[(Long, Long)].collect().toMap
      assert(got === bruteLpa(edges, rounds), s"trial $trial rounds $rounds")
    }
  }

  test("hits: exact-integer scores match the hand-unrolled matvec chain") {
    // bipartite: c1 -> {p1,p2}, c2 -> {p2}, c3 -> {p2,p3}
    val e = Seq((1L, 101L), (1L, 102L), (2L, 102L), (3L, 102L), (3L, 103L))
      .toDF("c", "p")
    val (h, a) = Graph.hits(e, "c", "p", iters = 2)
    // h1: c1=2, c2=1, c3=2
    // a1: p1=2, p2=2+1+2=5, p3=2
    // h2: c1=2+5=7, c2=5, c3=5+2=7
    // a2: p1=7, p2=7+5+7=19, p3=7
    assert(h.as[(Long, Long)].collect().toMap ===
      Map(1L -> 7L, 2L -> 5L, 3L -> 7L))
    assert(a.as[(Long, Long)].collect().toMap ===
      Map(101L -> 7L, 102L -> 19L, 103L -> 7L))
  }

  test("hits: duplicate input edges do not double-count") {
    val e = Seq((1L, 101L), (1L, 101L), (2L, 101L)).toDF("c", "p")
    val (h, a) = Graph.hits(e, "c", "p", iters = 1)
    assert(h.as[(Long, Long)].collect().toMap === Map(1L -> 1L, 2L -> 1L))
    assert(a.as[(Long, Long)].collect().toMap === Map(101L -> 2L))
  }

  test("modularity query: ingredients re-derive Q and the degree identity holds") {
    val rows = graft.queries.GraphQueries.modularity.run(spark, Sf001)
      .collect()
    assert(rows.nonEmpty)
    val q = rows.head.getAs[Double]("q_modularity")
    assert(rows.forall(_.getAs[Double]("q_modularity") === q), "Q is constant")
    assert(q > -0.5 && q <= 1.0)
    val dSum = rows.map(_.getAs[Long]("d_c")).sum
    assert(dSum % 2 === 0, "sum of community degree sums must be 2m")
    val m = dSum / 2
    val eSum = rows.map(_.getAs[Long]("e_c")).sum
    assert(eSum <= m, "intra edges cannot exceed total edges")
    val contrib = rows.map(r =>
      4L * m * r.getAs[Long]("e_c") -
        r.getAs[Long]("d_c") * r.getAs[Long]("d_c")).sum
    assert(q === contrib.toDouble / (4L * m * m).toDouble)
  }

  test("assortativity query: bounded in [-1,1], m2 is twice the edge count") {
    val r = graft.queries.GraphQueries.assortativity.run(spark, Sf001)
      .collect().head
    val m2 = r.getAs[Long]("m2")
    assert(m2 % 2 === 0)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0, a)
  }

  test("labelPropagation splits a barbell into its two cliques") {
    // two 4-cliques bridged by one edge: communities must NOT merge
    def clique(ids: Seq[Long]) =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) :+ ((4L, 11L))).toDF("a", "b")
    val got = Graph.labelPropagation(edges, "a", "b", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).map(got).toSet.size === 1, "left clique united")
    assert(Seq(11L, 12L, 13L, 14L).map(got).toSet.size === 1, "right clique united")
    assert(got(1L) !== got(11L), "bridge must not merge the cliques")
  }
}
