package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ml.MlPipeline
import graft.ops.Pca

/** ML dataflow surface (SURVEY §2a M1–M4) as driver-verifiable queries. */
object MlQueries {

  private val FeatureCols = Seq("l_quantity", "l_discount", "l_tax")

  /** M1 relational twin: feature assembly as a plain array column — the
    * SQL-expressible shape of VectorAssembler's output (the VectorUDT
    * variant runs inside q_gbt_predict; parquet can't carry VectorUDT in a
    * DuckDB-comparable form). The assembled array is built in-plan, then
    * the COMPARED projection unpacks it back to scalars: the driver's
    * pandas-side comparer cannot sort/hash array cells (unhashable
    * ndarray), so the gate output must be scalar columns. */
  val vectorAssemble = QuerySpec(
    "q_vector_assemble",
    (s, d) =>
      lineitem(s, d)
        .withColumn("features", array(FeatureCols.map(col): _*))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          size(col("features")).as("n_features"),
          element_at(col("features"), 1).as("f_qty"),
          element_at(col("features"), 2).as("f_disc"),
          element_at(col("features"), 3).as("f_tax"),
          col("l_extendedprice").as("label"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(len([l_quantity, l_discount, l_tax]) AS INTEGER) AS n_features,
             [l_quantity, l_discount, l_tax][1] AS f_qty,
             [l_quantity, l_discount, l_tax][2] AS f_disc,
             [l_quantity, l_discount, l_tax][3] AS f_tax,
             l_extendedprice AS label
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
    """))

  /** M2: seeded 70/30 split. The per-side COUNTS are engine-specific
    * (DuckDB has no Spark-seeded Bernoulli sampler), so the compared
    * output is the split's INVARIANTS, each of which the DuckDB oracle
    * can pin exactly (q_median_approx verdict pattern): the two sides
    * partition the table (row count and exact key sum both reconstruct
    * the full table — nothing lost, nothing duplicated), they are
    * disjoint (overlap join count 0), and the train share is within 4σ
    * of 0.7. MlSpec asserts the same invariants on the split frames. */
  val randomSplit = QuerySpec(
    "q_random_split",
    (s, d) => {
      val (train, test) = MlPipeline.seededSplit(orders(s, d))
      val both = train.withColumn("side", lit("train"))
        .unionByName(test.withColumn("side", lit("test")))
      val totals = both.agg(
        count(lit(1)).as("n_total"),
        sum(col("o_orderkey")).as("key_sum"),
        sum(when(col("side") === "train", 1L).otherwise(0L)).as("__n_train"))
      val overlap = train.select("o_orderkey")
        .join(test.select("o_orderkey"), "o_orderkey")
        .agg(count(lit(1)).as("n_overlap"))
      totals.crossJoin(overlap).select(
        col("n_total"), col("key_sum"), col("n_overlap"),
        // a ZERO-row split trivially satisfies the fraction band (the
        // degen `empty` corpus: __n_train is a NULL sum and 0/0 is NaN —
        // both would poison a bare boolean cast)
        when(col("n_total") === 0, 1).otherwise(
          (abs(col("__n_train").cast("double") / col("n_total") - 0.7) <=
            sqrt(lit(0.7 * 0.3) / col("n_total")) * 4.0)
            .cast("int")).cast("int").as("train_frac_ok"))
    },
    Some("""
      SELECT count(*) AS n_total,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
             CAST(0 AS BIGINT) AS n_overlap,
             1 AS train_frac_ok
      FROM orders
    """))

  /** M3+M4: assemble → seeded split → GBT fit (10 iterations, depth 4) →
    * predictions on the held-out side. Model output isn't SQL-expressible;
    * MlSpec checks RMSE is finite and beats the constant-mean predictor. */
  val gbtPredict = QuerySpec(
    "q_gbt_predict",
    (s, d) => {
      val base = lineitem(s, d)
        .select((Seq("l_orderkey", "l_linenumber", "l_extendedprice") ++ FeatureCols)
          .map(col): _*)
      // Boosting is a driver-orchestrated loop of ~5 aggregation jobs per
      // tree; per-JOB overhead scales with task count, so size partitions
      // by data volume (8 × ~50k rows at sf0.1), not core count — 32
      // tiny tasks per job made scheduling the dominant cost (re-measured:
      // 8 beats 16 here, 6.5s vs 6.8s min-of-2). At 100 TB the input
      // arrives in byte-sized splits and this repartition is a
      // sample-then-fit decision instead.
      val features = MlPipeline.assemble(base.repartition(8), FeatureCols)
      val (train, test) = MlPipeline.seededSplit(features)
      // Cap the fitted sample at ~150k rows. The fraction comes from a
      // column-less count of the BASE parquet table (cheap metadata-ish
      // scan) × the 0.7 split share — never a count through the
      // split+assemble lineage, which would be a full feature pass.
      val frac = math.min(1.0, 150000.0 / (0.7 * base.count()))
      val model = MlPipeline.trainGbt(train, "l_extendedprice", maxIter = 10,
        sampleFraction = frac)
      // The raw PREDICTIONS are engine-specific (tree split points depend
      // on MLlib's binning), so the compared output is the model-quality
      // verdict the DuckDB oracle can pin constant-true (q_median_approx
      // pattern): held-out predictions exist, their RMSE is finite, and it
      // stays within 5% of the constant-train-mean baseline. "Within", not
      // "beats": the driver's synthetic lineitem has NO feature→label
      // dependence (corr ≈ −0.01), so the mean IS the Bayes-optimal
      // predictor here and a sane model can only approach it — a model
      // that learned garbage (exploding or degenerate predictions) blows
      // the 5% band and hash-mismatches. Genuine learning (beating the
      // baseline on signal-bearing data) is asserted in MlSpec.
      val preds = model.transform(test)
        .select(col("l_extendedprice").as("label"), col("prediction"))
      val trainMean = train.agg(avg(col("l_extendedprice")).as("__mu"))
      preds.crossJoin(trainMean)
        .agg(
          count(lit(1)).as("__n"),
          sqrt(avg(pow(col("label") - col("prediction"), 2))).as("__rmse"),
          sqrt(avg(pow(col("label") - col("__mu"), 2))).as("__rmse_mean"))
        .select(
          (col("__n") > 0).cast("int").as("n_test_pos"),
          (!isnan(col("__rmse")) && col("__rmse") >= 0.0)
            .cast("int").as("rmse_finite"),
          // <= plus an additive 1e-6: on a constant-label corpus (degen
          // constant) the baseline RMSE is exactly 0 while boosting's
          // prediction carries sub-microscopic float residue — the band
          // must absorb both; 1e-6 is immaterial at the healthy corpus's
          // thousands-scale RMSE
          (col("__rmse") <= col("__rmse_mean") * 1.05 + 1e-6)
            .cast("int").as("near_baseline"))
    },
    Some("SELECT 1 AS n_test_pos, 1 AS rmse_finite, 1 AS near_baseline"))

  /** The REFERENCE's GBT configuration (untitled.py:232 —
    * GBTRegressor maxIter=100) under the driver gate, not just the
    * one-shot MlSpec parity case. The fitted sample is capped (~20k
    * rows, coalesced to 2 partitions) and predictions still run over
    * the full held-out side. Measured cost is MLlib's per-ITERATION
    * floor, ~0.35 s × 100 rounds REGARDLESS of sample size (34 s at a
    * 2k-row cap, 40 s at 20k, 43 s at 8 partitions — the boosting
    * loop's per-round job latency, not data or task count), which is
    * why this query is hash-gated in Verify every round but excluded
    * from the Bench timing loop (see Bench.benchExcluded): one
    * algorithm-floor-bound query would dominate a 177-query bench
    * total without measuring any plan choice this engine controls.
    * Same verdict oracle as q_gbt_predict: predictions exist, RMSE
    * finite, within 5% of the constant-mean baseline (the synthetic
    * lineitem carries no feature→label signal, so the mean is
    * Bayes-optimal — a diverged 100-tree model blows the band and
    * hash-mismatches). */
  val gbt100 = QuerySpec(
    "q_gbt_100",
    (s, d) => {
      val base = lineitem(s, d)
        .select((Seq("l_orderkey", "l_linenumber", "l_extendedprice") ++ FeatureCols)
          .map(col): _*)
      val features = MlPipeline.assemble(base.repartition(4), FeatureCols)
      val (train, test) = MlPipeline.seededSplit(features)
      val frac = math.min(1.0, 20000.0 / (0.7 * base.count()))
      val model = MlPipeline.trainGbt(train, "l_extendedprice", maxIter = 100,
        sampleFraction = frac, fitPartitions = 2)
      val preds = model.transform(test)
        .select(col("l_extendedprice").as("label"), col("prediction"))
      val trainMean = train.agg(avg(col("l_extendedprice")).as("__mu"))
      preds.crossJoin(trainMean)
        .agg(
          count(lit(1)).as("__n"),
          sqrt(avg(pow(col("label") - col("prediction"), 2))).as("__rmse"),
          sqrt(avg(pow(col("label") - col("__mu"), 2))).as("__rmse_mean"))
        .select(
          (col("__n") > 0).cast("int").as("n_test_pos"),
          (!isnan(col("__rmse")) && col("__rmse") >= 0.0)
            .cast("int").as("rmse_finite"),
          // <= plus an additive 1e-6: on a constant-label corpus (degen
          // constant) the baseline RMSE is exactly 0 while boosting's
          // prediction carries sub-microscopic float residue — the band
          // must absorb both; 1e-6 is immaterial at the healthy corpus's
          // thousands-scale RMSE
          (col("__rmse") <= col("__rmse_mean") * 1.05 + 1e-6)
            .cast("int").as("near_baseline"))
    },
    Some("SELECT 1 AS n_test_pos, 1 AS rmse_finite, 1 AS near_baseline"))

  /** Stratified (per-stratum) sampling — the dataset-mixing primitive of a
    * training pipeline (sample each source/language at its own rate).
    * Seeded `sampleBy`; sampling isn't SQL-oracle-able (SURVEY M2), so the
    * output is per-stratum counts and MlSpec bounds the rates. */
  /** Mixing rates shared with MlSpec's 4σ bound check. */
  val StratifiedFractions: Map[String, Double] = Map(
    "en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 0.25, "zh" -> 0.25)

  val sampleStratified = QuerySpec(
    "q_sample_stratified",
    (s, d) => {
      // Unlisted strata (none expected) sample at 0.0 — verdict stays true.
      val frac = StratifiedFractions.foldLeft(lit(0.0)) {
        case (acc, (lang, f)) => when(col("lang") === lang, f).otherwise(acc)
      }
      val sampled = documents(s, d)
        .stat.sampleBy("lang", StratifiedFractions, 42L)
        .groupBy("lang")
        .agg(count(lit(1)).as("__n_sampled"))
      // Per-stratum SAMPLE counts are engine-specific (seeded Bernoulli),
      // so the compared output is the exact stratum totals plus a 4σ
      // rate verdict per stratum, pinned constant-true by the oracle
      // (q_median_approx pattern; MlSpec asserts the same bound).
      documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .join(sampled, Seq("lang"), "left")
        .select(
          col("lang"), col("n_docs"),
          (abs(coalesce(col("__n_sampled"), lit(0L)).cast("double") /
            col("n_docs") - frac) <=
            sqrt(frac * (lit(1.0) - frac) / col("n_docs")) * 4.0)
            .cast("int").as("rate_ok"))
        .orderBy("lang")
    },
    Some("""
      SELECT lang, count(*) AS n_docs, 1 AS rate_ok
      FROM documents
      GROUP BY lang
      ORDER BY lang
    """))

  /** Distributed PCA over the embedding corpus ([[graft.ops.Pca]]):
    * covariance from relational decimal-exact sufficient statistics
    * (posexplode postings → id-co-located self-join → one
    * map-side-combinable decimal sum per (i, j) cell), cyclic-Jacobi
    * eigensolve of the 64×64 matrix at the driver, and the eigenbasis
    * verified BOTH algebraically (residual ‖Cv − λv‖∞, orthonormality,
    * descending order, trace = Σλ) and DISTRIBUTIONALLY — a second
    * corpus pass projects every row on the top components and the
    * decimal-summed projection variance must equal its eigenvalue
    * (Var(Xv) = vᵀCv = λ), which ties the driver-side solve back to the
    * actual data. Compared output: every covariance cell (the oracle
    * replays the decimal sums and the identical IEEE division sequence
    * cell-for-cell) + constant-true verdicts (q_gbt_predict pattern —
    * eigenvectors themselves are not SQL-expressible). */
  val pca = QuerySpec(
    "q_pca",
    (s, d) => {
      val posts = Pca.postings(embeddings(s, d), "vec_id", "embedding")
        .cache()
      val covDf = Pca.covariance(posts).cache()
      // d(d+1)/2 = 2080 cells — bounded by the embedding width, not the
      // corpus; the same driver-boundary as LogReg's Newton solve
      val cells = covDf.collect()
      if (cells.isEmpty || cells.exists(_.isNullAt(2))) {
        // zero vectors → no covariance cells; ONE vector → NULL cells
        // (no sample covariance) — nothing to eigensolve either way, and
        // the oracle's frame carries the same emptiness/NULLs
        covDf.select(col("i"), col("j"),
          (round(col("cov"), 9) + lit(0.0)).as("cov"),
          lit(1).as("eig_residual_ok"), lit(1).as("orthonormal_ok"),
          lit(1).as("lambda_sorted_ok"), lit(1).as("trace_ok"),
          lit(1).as("var_matches_ok"))
      } else {
      val dim = cells.map(_.getInt(0)).max
      val m = Array.ofDim[Double](dim, dim)
      cells.foreach { r =>
        val (i, j, c) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
        m(i)(j) = c; m(j)(i) = c
      }
      val eig = Pca.jacobi(m)
      val (lam, vecs) = (eig.values, eig.vectors)
      val scale = math.max(lam.map(math.abs).max, 1e-9)
      val topK = 4
      val residualOk = (0 until topK).forall { k =>
        (0 until dim).forall { i =>
          val cv = (0 until dim).map(j => m(i)(j) * vecs(k)(j)).sum
          math.abs(cv - lam(k) * vecs(k)(i)) <= 1e-8 * scale
        }
      }
      val orthoOk =
        (for (k <- 0 until topK; l <- k until topK) yield (k, l)).forall {
          case (k, l) =>
            val dot = (0 until dim).map(i => vecs(k)(i) * vecs(l)(i)).sum
            math.abs(dot - (if (k == l) 1.0 else 0.0)) <= 1e-8
        }
      val sortedOk = lam.toSeq.sliding(2).forall(p => p(0) >= p(1) - 1e-12)
      val trace = (0 until dim).map(i => m(i)(i)).sum
      val traceOk =
        math.abs(lam.sum - trace) <= 1e-6 * math.max(math.abs(trace), 1e-9)
      // the distributed half of the verdict: top-2 projection variances
      // (two bounded aggregate jobs) must hit their eigenvalues
      val varOk = (0 until 2).forall { k =>
        math.abs(Pca.projectionVariance(s, posts, vecs(k)) - lam(k)) <=
          1e-6 * scale
      }
      // round(9) on BOTH engines: DuckDB's DECIMAL(38,18)→DOUBLE
      // double-rounds through int128 while the JVM's cast is correctly
      // rounded (the q_lm_score precedent) — the unrounded cells differ
      // in the last ulp. The driver-side eigensolve and verdicts use the
      // full-precision values; only the compared artifact rounds.
      // +0.0 canonicalizes the IEEE zero sign: zero-variance cells round
      // to -0.0 through DuckDB's double path and the hash is bit-sensitive
      covDf.select(col("i"), col("j"),
          (round(col("cov"), 9) + lit(0.0)).as("cov"),
          lit(if (residualOk) 1 else 0).as("eig_residual_ok"),
          lit(if (orthoOk) 1 else 0).as("orthonormal_ok"),
          lit(if (sortedOk) 1 else 0).as("lambda_sorted_ok"),
          lit(if (traceOk) 1 else 0).as("trace_ok"),
          lit(if (varOk) 1 else 0).as("var_matches_ok"))
        .orderBy("i", "j")
      }
    },
    Some("""
      WITH p AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                     unnest(range(1, len(embedding) + 1)) AS i
              FROM embeddings)
      ),
      snd AS (
        SELECT a.i AS i, b.i AS j,
               CAST(sum(CAST(a.x * b.x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
        FROM p a JOIN p b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
      ),
      fst AS (
        SELECT i, CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
               count(*) AS n
        FROM p GROUP BY 1
      )
      SELECT CAST(snd.i AS INTEGER) AS i, CAST(snd.j AS INTEGER) AS j,
             round((sxx - fi.sx * fj.sx / fi.n) / (fi.n - 1), 9) + 0.0 AS cov,
             1 AS eig_residual_ok, 1 AS orthonormal_ok,
             1 AS lambda_sorted_ok, 1 AS trace_ok, 1 AS var_matches_ok
      FROM snd JOIN fst fi ON fi.i = snd.i JOIN fst fj ON fj.i = snd.j
      ORDER BY i, j
    """))

  /** Distributed sparse matrix multiply ([[graft.ops.Linalg.spgemm]]):
    * A (order×part quantity matrix, folded to 240×120) times B (a
    * part-derived 120×60 integer matrix) in COO form — the join-contract-
    * aggregate shape that IS engine-native linear algebra. Integer values
    * make the product exact, so the oracle is the same join-group-sum.
    * Inputs are deliberately NOT pre-aggregated: duplicate (i,k) entries
    * must distribute over the product, which the op's bilinearity
    * guarantees and the oracle replays. */
  val spgemm = QuerySpec(
    "q_spgemm",
    (s, d) => {
      // PRE-AGGREGATED operands (bilinearity makes it equivalent, the
      // op's scaladoc contract): the raw 600k-row × ~170-rows-per-k fan
      // out is ~100M intermediate rows; folded to matrix cells first,
      // the contraction join fans out to ~1.7M — the map-side-combine
      // rule applied to linear algebra
      val a = lineitem(s, d).select(
        (col("l_orderkey") % 240).as("i"),
        (col("l_partkey") % 120).as("k"),
        col("l_quantity").cast("long").as("v"))
        .groupBy("i", "k").agg(sum("v").as("v"))
      val b = part(s, d).select(
        (col("p_partkey") % 120).as("k"),
        (col("p_partkey") % 60).as("j"),
        (col("p_partkey") % 7 + 1).as("w"))
        .groupBy("k", "j").agg(sum("w").as("w"))
      graft.ops.Linalg.spgemm(a, "i", "k", "v", b, "k", "j", "w")
        .orderBy("i", "j")
    },
    Some("""
      WITH a AS (
        SELECT l_orderkey % 240 AS i, l_partkey % 120 AS k,
               CAST(l_quantity AS BIGINT) AS v
        FROM lineitem
      ),
      b AS (
        SELECT p_partkey % 120 AS k, p_partkey % 60 AS j,
               p_partkey % 7 + 1 AS w
        FROM part
      )
      SELECT a.i, b.j, CAST(sum(a.v * b.w) AS BIGINT) AS c
      FROM a JOIN b ON a.k = b.k
      GROUP BY 1, 2
      ORDER BY i, j
    """))

  /** Two-class categorical Naive Bayes ([[graft.ops.NaiveBayes]]):
    * predict "urgent-or-high priority" from order status + order year.
    * The whole model is contingency aggregates, and the smoothed scores
    * are a fixed chain of IEEE ops over exact counts — so unlike GBT/
    * logreg (verdict-oracled), THIS classifier's scores are replayed by
    * DuckDB bit-for-bit, no verdict needed. Output is the scored
    * contingency table (one row per observed feature combination). */
  val naiveBayes = QuerySpec(
    "q_naive_bayes",
    (s, d) => {
      val base = orders(s, d).select(
        col("o_orderstatus").as("f_status"),
        year(col("o_orderdate")).as("f_year"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
          .as("y"))
      graft.ops.NaiveBayes.scoreTable(base, Seq("f_status", "f_year"), "y")
        .orderBy("f_status", "f_year")
    },
    Some("""
      WITH base AS (
        SELECT o_orderstatus AS f_status,
               CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS f_year,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS y
        FROM orders
      ),
      cls AS (SELECT CAST(sum(y) AS BIGINT) AS npos,
                     CAST(count(*) AS BIGINT) AS n FROM base),
      t1 AS (SELECT f_status, CAST(sum(y) AS BIGINT) AS p1,
                    CAST(count(*) AS BIGINT) AS c1
             FROM base GROUP BY 1),
      v1 AS (SELECT CAST(count(*) AS BIGINT) AS v1 FROM t1),
      t2 AS (SELECT f_year, CAST(sum(y) AS BIGINT) AS p2,
                    CAST(count(*) AS BIGINT) AS c2
             FROM base GROUP BY 1),
      v2 AS (SELECT CAST(count(*) AS BIGINT) AS v2 FROM t2),
      combos AS (SELECT f_status, f_year, CAST(count(*) AS BIGINT) AS n_rows
                 FROM base GROUP BY 1, 2),
      scored AS (
        SELECT co.f_status, co.f_year, co.n_rows,
               CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)
                 * (CAST(p1 + 1 AS DOUBLE) / CAST(npos + v1 AS DOUBLE))
                 * (CAST(p2 + 1 AS DOUBLE) / CAST(npos + v2 AS DOUBLE))
                 AS p_pos,
               CAST(n - npos AS DOUBLE) / CAST(n AS DOUBLE)
                 * (CAST(c1 - p1 + 1 AS DOUBLE)
                    / CAST(n - npos + v1 AS DOUBLE))
                 * (CAST(c2 - p2 + 1 AS DOUBLE)
                    / CAST(n - npos + v2 AS DOUBLE))
                 AS p_neg
        FROM combos co
        JOIN t1 ON t1.f_status = co.f_status
        JOIN t2 ON t2.f_year = co.f_year
        CROSS JOIN cls CROSS JOIN v1 CROSS JOIN v2
      )
      SELECT f_status, f_year, n_rows, p_pos, p_neg,
             CASE WHEN p_pos > p_neg THEN 1 ELSE 0 END AS pred
      FROM scored
      ORDER BY f_status, f_year
    """))

  /** Rank-1 ALS / power iteration on the customer×brand purchase matrix
    * — matrix factorization as relational algebra, EXACT: with v⁰ ≡ 1,
    * every alternation is an integer matrix-vector product
    * (u¹ = R·1 = row sums; v¹ = Rᵀu¹; u² = R·v¹), so the first three
    * half-steps stay in exact integers accumulated as DECIMAL(38,0) —
    * no float accumulation ANYWHERE, which is what makes a distributed
    * eigenvector iteration hash-gateable cell-for-cell (the same
    * sufficient-statistics discipline as q_linreg, lifted from vectors
    * to a matrix). u² is the unnormalized leading-eigenvector score of
    * R·Rᵀ — "how much does this customer load on the dominant
    * purchasing pattern" — the quantity a real recommender's first
    * factor captures. Magnitudes stay < 2⁵³ through u² at every test
    * SF (documented bound; the NEXT half-step v² would overflow double
    * exactness and is deliberately not taken). Every step is a
    * map-side-combinable aggregate or a broadcast-bounded join on the
    * brand dimension (|brands| = 25); nothing iterates per-row. */
  val alsRank1 = QuerySpec(
    "q_als_rank1",
    (s, d) => {
      val r = lineitem(s, d)
        .join(part(s, d).select(col("p_partkey").as("l_partkey"),
          col("p_brand")), "l_partkey")
        .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"),
          col("o_custkey")), "l_orderkey")
        .groupBy(col("o_custkey").as("c"), col("p_brand").as("b"))
        .agg(sum(col("l_quantity").cast("long")).as("r"))
        .localCheckpoint()
      val u1 = r.groupBy("c").agg(sum("r").as("n1"))
      val v1 = r.join(u1, "c")
        .groupBy("b")
        .agg(sum((col("n1") * col("r")).cast("decimal(38,0)"))
          .cast("double").as("v1"))
      val u2 = r.join(broadcast(v1), "b")
        .groupBy("c")
        // products are INTEGER-valued (r·v1 with v1 an exact integer in
        // double): scale-0 decimal keeps the final →double cast a single
        // correct rounding in both engines (a scaled decimal
        // double-rounds in DuckDB — the q_diff_in_diff lesson)
        .agg(sum((col("r").cast("double") * col("v1"))
          .cast("decimal(38,0)")).cast("double").as("u2"))
      u2.join(u1, "c")
        .select(col("c").as("custkey"), col("n1").as("qty_total"),
          col("u2").as("factor_score"))
        .orderBy(col("factor_score").desc, col("custkey"))
        .limit(15)
    },
    Some("""
      WITH r AS (
        SELECT o.o_custkey AS c, p.p_brand AS b,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS r
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
      ),
      u1 AS (SELECT c, CAST(sum(r) AS BIGINT) AS n1 FROM r GROUP BY 1),
      v1 AS (
        SELECT b, CAST(sum(CAST(n1 * r AS DECIMAL(38,0))) AS DOUBLE) AS v1
        FROM r JOIN u1 USING (c)
        GROUP BY 1
      ),
      u2 AS (
        SELECT c, CAST(sum(CAST(CAST(r AS DOUBLE) * v1 AS DECIMAL(38,0)))
                       AS DOUBLE) AS u2
        FROM r JOIN v1 USING (b)
        GROUP BY 1
      )
      SELECT c AS custkey, n1 AS qty_total, u2 AS factor_score
      FROM u2 JOIN u1 USING (c)
      ORDER BY factor_score DESC, custkey
      LIMIT 15
    """))

  val all: Seq[QuerySpec] = Seq(
    vectorAssemble, randomSplit, gbtPredict, gbt100, sampleStratified, pca,
    spgemm, naiveBayes, alsRank1)
}
