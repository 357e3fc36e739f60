package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.Geo

/** Spatial surface (graft.ops.Geo) — grid-blocked radius join, bounded kNN,
  * and cell density rollup, the queries behind the reference's station-map
  * output (map_tutorial.html:48-71) generalized to engine operators.
  *
  * Coordinates are derived IN-PLAN from c_custkey by integer arithmetic
  * (the q_image_decode precedent: the engine must actually run the blocking
  * join, while the oracle recomputes the same coordinates directly and
  * brute-forces the pairs — any blocking bug, missed boundary cell, or
  * duplicate candidate hash-mismatches loudly). All distances are exact
  * int64 squared Euclidean: no trig, no IEEE drift, portable to DuckDB
  * cell-for-cell.
  */
object GeoQueries {

  private val d38 = "decimal(38,0)"

  /** 0..999999 × 0..999999 integer plane, scattered by a QUADRATIC mix
    * (square a linear hash mod a prime, then reduce): a plain linear map
    * puts consecutive custkeys on a fixed-stride lattice with ZERO near
    * pairs at sf0.001 — an empty gate proves nothing. The quadratic step
    * breaks the lattice (13 / 1.3k / 139k pairs at the three SFs) while
    * every intermediate stays far inside int64 for both engines. Mirrored
    * verbatim in each oracle's `pts` CTE. */
  private def points(s: SparkSession, d: String): DataFrame = {
    val u = (col("c_custkey") * lit(2654435761L)) % lit(1048573L)
    val v = (col("c_custkey") * lit(1103515245L) + lit(12345L)) % lit(1048573L)
    customer(s, d).select(
      col("c_custkey").as("key"),
      ((u * u) % lit(1000000L)).as("x"),
      ((v * v) % lit(1000000L)).as("y"))
  }

  private val PtsCte = """
      WITH base AS (
        SELECT c_custkey AS k,
               (c_custkey * 2654435761) % 1048573 AS u,
               (c_custkey * 1103515245 + 12345) % 1048573 AS v
        FROM customer
      ),
      pts AS (
        SELECT k, (u * u) % 1000000 AS x, (v * v) % 1000000 AS y FROM base
      )"""

  private val Cell = 25000L
  private val Radius = 20000L // radius <= cell: 3x3 cover is exact

  /** Radius self-join: all unordered point pairs within 20k units. The
    * engine meets pairs in exactly one grid cell (Geo.neighborPairs);
    * the oracle brute-forces n² — identical pair sets or the gate fails. */
  val neighborJoin = QuerySpec(
    "q_geo_neighbor_join",
    (s, d) =>
      Geo.neighborPairs(points(s, d), Cell, Radius)
        .orderBy("key_a", "key_b"),
    Some(s"""
      $PtsCte
      SELECT a.k AS key_a, b.k AS key_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      FROM pts a JOIN pts b ON a.k < b.k
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= ${Radius * Radius}
      ORDER BY key_a, key_b
    """))

  /** Radius-bounded 3-NN per point, ranked by (dist2, key_b). Points whose
    * true NN is beyond the radius report fewer than 3 rows — the honest
    * 100 TB scoping (unbounded kNN needs an all-pairs fallback). */
  val knn = QuerySpec(
    "q_geo_knn",
    (s, d) =>
      Geo.radiusKnn(points(s, d), Cell, Radius, k = 3)
        .orderBy("key_a", "rank"),
    Some(s"""
      $PtsCte,
      cand AS (
        SELECT a.k AS key_a, b.k AS key_b,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
        FROM pts a JOIN pts b ON a.k <> b.k
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= ${Radius * Radius}
      )
      SELECT key_a, rank, key_b, dist2 FROM (
        SELECT key_a, key_b, dist2,
               CAST(row_number() OVER (PARTITION BY key_a
                                       ORDER BY dist2, key_b) AS INTEGER)
                 AS rank
        FROM cand)
      WHERE rank <= 3
      ORDER BY key_a, rank
    """))

  /** Cell density rollup — the map's heat layer: one map-side-combinable
    * aggregate per 25k×25k cell, exact int64 outputs only. */
  val gridAgg = QuerySpec(
    "q_geo_grid_agg",
    (s, d) =>
      Geo.gridAggregate(points(s, d), Cell)
        .orderBy("cell_x", "cell_y"),
    Some(s"""
      $PtsCte
      SELECT x // $Cell AS cell_x, y // $Cell AS cell_y,
             CAST(count(*) AS BIGINT) AS n_points,
             min(k) AS min_key, max(k) AS max_key,
             CAST(sum(k) AS BIGINT) AS sum_key
      FROM pts
      GROUP BY 1, 2
      ORDER BY cell_x, cell_y
    """))

  /** Supplier plane under DIFFERENT mix constants, so the two relations
    * are spatially independent. */
  private def supplierPoints(s: SparkSession, d: String): DataFrame = {
    val u = (col("s_suppkey") * lit(2246822519L)) % lit(1048573L)
    val v = (col("s_suppkey") * lit(3266489917L) + lit(54321L)) % lit(1048573L)
    supplier(s, d).select(
      col("s_suppkey").as("key"),
      ((u * u) % lit(1000000L)).as("x"),
      ((v * v) % lit(1000000L)).as("y"))
  }

  private val BiCell = 50000L // supplier density is 10x lower: wider reach

  /** Nearest-supplier assignment: for every customer, the closest
    * supplier within 50k units (ties by supplier key) — the bipartite
    * radius join + per-key argmin. Customers with no supplier in range
    * are absent, not null-padded (the honest bounded-radius semantics).
    * The oracle brute-forces customers × suppliers and replays the
    * argmin with a window. */
  val nearest = QuerySpec(
    "q_geo_nearest",
    (s, d) =>
      Geo.nearestNeighbor(points(s, d), supplierPoints(s, d), BiCell, BiCell)
        .orderBy("key_a"),
    Some(s"""
      $PtsCte,
      sb AS (
        SELECT s_suppkey AS k,
               (s_suppkey * 2246822519) % 1048573 AS u,
               (s_suppkey * 3266489917 + 54321) % 1048573 AS v
        FROM supplier
      ),
      spts AS (
        SELECT k, (u * u) % 1000000 AS x, (v * v) % 1000000 AS y FROM sb
      ),
      cand AS (
        SELECT c.k AS key_a, s.k AS key_b,
               (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
        FROM pts c JOIN spts s
          ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
             <= ${BiCell * BiCell}
      )
      SELECT key_a, key_b, dist2 FROM (
        SELECT key_a, key_b, dist2,
               row_number() OVER (PARTITION BY key_a
                                  ORDER BY dist2, key_b) AS rn
        FROM cand)
      WHERE rn = 1
      ORDER BY key_a
    """))

  /** DBSCAN over the customer plane ([[graft.ops.Geo.dbscan]]): grid-
    * blocked ε-neighborhoods → degree-counted core test → two-star CC on
    * the core-core graph → nearest-core border attach. ε² is DERIVED from
    * the data as AREA_K / n (one bounded driver count, the globalRank
    * build-job precedent), so the expected neighborhood size — and with
    * it the core/border/noise mix (~22/55/23%) — is SF-invariant: a
    * fixed ε would make everything core at 100× density and the gate
    * would prove nothing. The oracle brute-forces the ε-graph n²-style,
    * replays ε² with the same integer division, and labels components
    * with a recursive min-label CTE (the q_cc_labels pattern). */
  val dbscanQ = QuerySpec(
    "q_dbscan",
    (s, d) => {
      val pts = points(s, d)
      val n = pts.count()
      // guard the DRIVER division: on an empty corpus any ε works — the
      // grid over zero points is empty either way (degen `empty` corpus)
      val r2 = if (n == 0) 1L else 540000000000L / n
      val cell = math.ceil(math.sqrt(r2.toDouble)).toLong
      Geo.dbscan(pts, cell, r2, minPts = 4)
        .orderBy("key")
    },
    Some(s"""
      WITH RECURSIVE base AS (
        SELECT c_custkey AS k,
               (c_custkey * 2654435761) % 1048573 AS u,
               (c_custkey * 1103515245 + 12345) % 1048573 AS v
        FROM customer
      ),
      pts AS (
        SELECT k, (u * u) % 1000000 AS x, (v * v) % 1000000 AS y FROM base
      ),
      nn AS (SELECT count(*) AS n FROM pts),
      pr AS (
        SELECT a.k AS ka, b.k AS kb,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        FROM pts a, pts b, nn
        WHERE a.k < b.k
          AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= 540000000000 // nn.n
      ),
      deg AS (SELECT k, count(*) AS nd FROM
                (SELECT ka AS k FROM pr UNION ALL SELECT kb FROM pr)
              GROUP BY 1),
      flag AS (SELECT p.k, coalesce(d.nd, 0) + 1 >= 4 AS is_core
               FROM pts p LEFT JOIN deg d ON d.k = p.k),
      core AS (SELECT k FROM flag WHERE is_core),
      cedges AS (
        SELECT ka AS s, kb AS t FROM pr
        WHERE ka IN (SELECT k FROM core) AND kb IN (SELECT k FROM core)
        UNION
        SELECT kb, ka FROM pr
        WHERE ka IN (SELECT k FROM core) AND kb IN (SELECT k FROM core)
      ),
      reach(a, b) AS (
        SELECT k, k FROM core
        UNION
        SELECT r.a, e.t FROM reach r JOIN cedges e ON r.b = e.s
      ),
      clab AS (SELECT a AS k, min(b) AS cid FROM reach GROUP BY a),
      dirp AS (SELECT ka AS p, kb AS q, d2 FROM pr
               UNION ALL SELECT kb, ka, d2 FROM pr),
      border AS (
        SELECT p AS k, cid FROM (
          SELECT d.p, cl.cid,
                 row_number() OVER (PARTITION BY d.p
                                    ORDER BY d.d2, d.q) AS rn
          FROM dirp d
          JOIN clab cl ON cl.k = d.q
          JOIN flag f ON f.k = d.p AND NOT f.is_core)
        WHERE rn = 1
      )
      SELECT f.k AS key,
             CASE WHEN f.is_core THEN 'core'
                  WHEN b.cid IS NOT NULL THEN 'border'
                  ELSE 'noise' END AS role,
             coalesce(cl.cid, b.cid, -1) AS cluster_id
      FROM flag f
      LEFT JOIN clab cl ON cl.k = f.k
      LEFT JOIN border b ON b.k = f.k
      ORDER BY key
    """))

  /** Local Outlier Factor (Breunig et al. 2000) at k = 3 over the
    * radius-bounded kNN graph — density-RATIO outlier detection, the
    * diagnostic [[dbscanQ]]'s binary core/noise split can't give:
    * LOF(p) = mean_o∈kNN(p) lrd(o) / lrd(p), lrd = k / Σ reach-dist,
    * reach-dist(p→o) = max(kdist(o), d(p,o)). Honest radius scoping
    * (the [[knn]] contract) makes the definition chain PARTIAL:
    * kdist needs a full k neighbors, lrd needs all k neighbors to
    * carry a kdist, LOF needs all k to carry an lrd — each stage is
    * an inner join + count-equals-k filter, deterministic and
    * identical in the oracle, rather than an unstated silent drop.
    * All distances are √(exact int dist2) (sqrt is correctly rounded
    * — the one libm op allowed unrounded); the two 3-term sums fold
    * in NEIGHBOR-RANK order on both engines. Top-15 by LOF
    * (tie → key): scores ≈ 1 are inliers, the tail is the read. */
  val lofQ = QuerySpec(
    "q_lof",
    (s, d) => {
      val nn = Geo.radiusKnn(points(s, d), Cell, Radius, k = 3)
        .localCheckpoint()
      val full = nn.groupBy("key_a").agg(count(lit(1)).as("nc"))
        .filter(col("nc") === 3).select(col("key_a"))
      val kdist = nn.filter(col("rank") === 3)
        .join(full, "key_a")
        .select(col("key_a").as("key"), sqrt(col("dist2").cast("double"))
          .as("kdist"))
      val reach = nn.join(full, "key_a")
        .join(kdist.select(col("key").as("key_b"), col("kdist")
          .as("kdist_o")), "key_b")
        .select(col("key_a"), col("rank"),
          greatest(col("kdist_o"), sqrt(col("dist2").cast("double")))
          .as("rd"))
      val lrd = reach.groupBy("key_a")
        .agg(count(lit(1)).as("nr"),
          aggregate(
            array_sort(collect_list(struct(col("rank"), col("rd")))),
            lit(0.0), (acc, x) => acc + x.getField("rd")).as("srd"))
        .filter(col("nr") === 3)
        .select(col("key_a").as("key"), (lit(3.0) / col("srd")).as("lrd"))
      val lof = nn.join(lrd.select(col("key").as("key_a"),
          col("lrd").as("lrd_p")), "key_a")
        .join(lrd.select(col("key").as("key_b"), col("lrd").as("lrd_o")),
          "key_b")
        .groupBy(col("key_a"), col("lrd_p"))
        .agg(count(lit(1)).as("no"),
          aggregate(
            array_sort(collect_list(struct(col("rank"), col("lrd_o")))),
            lit(0.0), (acc, x) => acc + x.getField("lrd_o")).as("slrd"))
        .filter(col("no") === 3)
        .select(col("key_a").as("key"),
          (col("slrd") / col("lrd_p") / lit(3.0)).as("lof"))
      lof.orderBy(col("lof").desc, col("key")).limit(15)
    },
    Some(s"""
      $PtsCte,
      cand AS (
        SELECT a.k AS key_a, b.k AS key_b,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
        FROM pts a JOIN pts b ON a.k <> b.k
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= ${Radius * Radius}
      ),
      nn AS (
        SELECT key_a, key_b, dist2,
               CAST(row_number() OVER (PARTITION BY key_a
                                       ORDER BY dist2, key_b) AS INTEGER)
                 AS rank
        FROM cand QUALIFY rank <= 3
      ),
      fullk AS (SELECT key_a FROM nn GROUP BY key_a HAVING count(*) = 3),
      kdist AS (
        SELECT n.key_a AS key, sqrt(CAST(n.dist2 AS DOUBLE)) AS kdist
        FROM nn n JOIN fullk USING (key_a)
        WHERE n.rank = 3
      ),
      reach AS (
        SELECT n.key_a, n.rank,
               greatest(ko.kdist, sqrt(CAST(n.dist2 AS DOUBLE))) AS rd
        FROM nn n
        JOIN fullk USING (key_a)
        JOIN kdist ko ON ko.key = n.key_b
      ),
      lrd AS (
        SELECT key_a AS key,
               3.0 / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                              list(rd ORDER BY rank)),
                                 (a, b) -> a + b) AS lrd
        FROM reach
        GROUP BY key_a
        HAVING count(*) = 3
      ),
      lof AS (
        SELECT n.key_a AS key,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(lo.lrd ORDER BY n.rank)),
                           (a, b) -> a + b) / lp.lrd / 3.0 AS lof
        FROM nn n
        JOIN lrd lp ON lp.key = n.key_a
        JOIN lrd lo ON lo.key = n.key_b
        GROUP BY n.key_a, lp.lrd
        HAVING count(*) = 3
      )
      SELECT key, lof FROM lof
      ORDER BY lof DESC, key
      LIMIT 15
    """))

  /** Spatial autocorrelation of the customer-plane density surface:
    * Moran's I and Geary's C over the grid cells' point counts with
    * rook adjacency (share an edge) — the "is density clumped or
    * dispersed?" diagnostic behind every heat map. Both statistics stay
    * EXACT integers end-to-end by multiplying the cell mean out:
    * zᵢ = n·cᵢ − S (n = cells, S = total points), so
    * I = (n/W)·Σᵢⱼ zᵢzⱼ / Σzᵢ² and
    * C = (n−1)·n²·Σᵢⱼ(cᵢ−cⱼ)² / (2W·Σzᵢ²) need one double division
    * each. Neighbor pairs come from a 4-offset explode + equi-join on
    * the BOUNDED cell frame (the 3×3-cover discipline, one axis). */
  val moranGeary = QuerySpec(
    "q_moran_i",
    (s, d) => {
      val cells = Geo.gridAggregate(points(s, d), Cell)
        .select(col("cell_x"), col("cell_y"), col("n_points").as("c"))
      val tot = cells.agg(count(lit(1)).as("n"),
        sum(col("c").cast(d38)).as("ss"))
      val offsets = array(
        struct(lit(1L).as("dx"), lit(0L).as("dy")),
        struct(lit(-1L).as("dx"), lit(0L).as("dy")),
        struct(lit(0L).as("dx"), lit(1L).as("dy")),
        struct(lit(0L).as("dx"), lit(-1L).as("dy")))
      val probe = cells.select(
        col("cell_x"), col("cell_y"), col("c").as("cj"),
        explode(offsets).as("off"))
        .select((col("cell_x") + col("off.dx")).as("cell_x"),
          (col("cell_y") + col("off.dy")).as("cell_y"), col("cj"))
      val pairs = cells.join(probe, Seq("cell_x", "cell_y"))
        .crossJoin(broadcast(tot))
        .agg(count(lit(1)).as("w"),
          sum((col("n").cast(d38) * col("c") - col("ss")) *
            (col("n").cast(d38) * col("cj") - col("ss"))).as("cross"),
          sum((col("c") - col("cj")).cast(d38) *
            (col("c") - col("cj"))).as("sqdiff"))
      val denom = cells.crossJoin(broadcast(tot))
        .agg(max("n").as("n"),
          sum((col("n").cast(d38) * col("c") - col("ss")) *
            (col("n").cast(d38) * col("c") - col("ss"))).as("szz"))
      denom.crossJoin(broadcast(pairs))
        .select(col("n").as("n_cells"), col("w").as("w_pairs"),
          round(col("n").cast("double") * col("cross").cast("double") /
            (col("w").cast("double") * col("szz").cast("double")), 6)
            .as("moran_i"),
          round((col("n").cast("double") - 1.0) * col("n").cast("double") *
            col("n").cast("double") * col("sqdiff").cast("double") /
            (lit(2.0) * col("w").cast("double") *
              col("szz").cast("double")), 6)
            .as("geary_c"))
    },
    Some(s"""
      $PtsCte,
      cells AS (
        SELECT x // $Cell AS cell_x, y // $Cell AS cell_y,
               CAST(count(*) AS BIGINT) AS c
        FROM pts GROUP BY 1, 2
      ),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0))
                       AS ss
              FROM cells),
      probe AS (
        SELECT cell_x + o.dx AS cell_x, cell_y + o.dy AS cell_y, c AS cj
        FROM cells, (SELECT unnest([1, -1, 0, 0]) AS dx,
                            unnest([0, 0, 1, -1]) AS dy) o
      ),
      pairs AS (
        SELECT CAST(count(*) AS BIGINT) AS w,
               CAST(sum((CAST(n AS DECIMAL(38,0)) * a.c - ss)
                 * (CAST(n AS DECIMAL(38,0)) * p.cj - ss)) AS DECIMAL(38,0))
                 AS crossz,
               CAST(sum(CAST(a.c - p.cj AS DECIMAL(38,0)) * (a.c - p.cj))
                 AS DECIMAL(38,0)) AS sqdiff
        FROM cells a JOIN probe p USING (cell_x, cell_y) CROSS JOIN tot
      ),
      denom AS (
        SELECT max(n) AS n,
               CAST(sum((CAST(n AS DECIMAL(38,0)) * c - ss)
                 * (CAST(n AS DECIMAL(38,0)) * c - ss)) AS DECIMAL(38,0))
                 AS szz
        FROM cells CROSS JOIN tot
      )
      SELECT n AS n_cells, w AS w_pairs,
             round(CAST(n AS DOUBLE) * CAST(crossz AS DOUBLE)
                   / (CAST(w AS DOUBLE) * CAST(szz AS DOUBLE)), 6)
               AS moran_i,
             round((CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE)
                   * CAST(n AS DOUBLE) * CAST(sqdiff AS DOUBLE)
                   / (2.0 * CAST(w AS DOUBLE) * CAST(szz AS DOUBLE)), 6)
               AS geary_c
      FROM denom CROSS JOIN pairs
    """))

  def all: Seq[QuerySpec] =
    Seq(neighborJoin, knn, gridAgg, nearest, dbscanQ, lofQ, moranGeary)
}
