package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.Similarity

/** Feature-engineering operators — the step between curated data and a
  * trained model: profiling distributions (histogram), scoring feature
  * relevance (chi²), encoding categoricals without leakage (leave-one-out
  * target encoding), validating a fit honestly (k-fold CV), and emitting
  * the training pairs embedding models consume (skip-grams, k-NN labels).
  * The reference stops at VectorAssembler + a GBT (untitled.py:169-178);
  * this module is what its pipeline would need next.
  *
  * Exactness discipline (the EvalQueries contract): every statistic
  * reduces to integer/decimal sufficient statistics; doubles appear only
  * in final arithmetic whose expression SHAPE is written identically in
  * the engine and the oracle, so both replay the same IEEE sequence.
  */
object FeatureQueries {

  /** Equi-width histogram of o_totalprice: 30 bins of width 20 000 over
    * [0, 600 000), top bin clamps the tail (the standard profile-report
    * shape; production pins literal bounds exactly like this so shards
    * histogram independently without a pre-pass). One map-side-combinable
    * groupBy over arithmetic on the scan — no shuffle beyond the 30-key
    * exchange; `share` is the single final double division. Empty bins
    * are absent (no gap-fill): the reader is a profiler, not a chart. */
  val histogram = QuerySpec(
    "q_histogram",
    (s, d) => {
      val binned = orders(s, d).select(
        least(floor(col("o_totalprice") / lit(20000.0)), lit(29L))
          .cast("long").as("bin"))
      binned.groupBy("bin").agg(count(lit(1)).as("n"))
        .crossJoin(binned.agg(count(lit(1)).as("__tot")))
        .select(
          col("bin"),
          (col("bin") * 20000L).as("lo"),
          ((col("bin") + 1L) * 20000L).as("hi"),
          col("n"),
          (col("n").cast("double") / col("__tot").cast("double")).as("share"))
        .orderBy("bin")
    },
    Some("""
      WITH b AS (
        SELECT CAST(least(floor(o_totalprice / 20000.0), 29) AS BIGINT)
                 AS bin
        FROM orders
      ),
      g AS (SELECT bin, count(*) AS n FROM b GROUP BY bin),
      t AS (SELECT count(*) AS tot FROM b)
      SELECT bin, bin * 20000 AS lo, (bin + 1) * 20000 AS hi, n,
             CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share
      FROM g CROSS JOIN t
      ORDER BY bin
    """))

  /** Leave-one-out target encoding of the customer's nation against the
    * order-total target — the leakage-safe categorical encoding: each
    * row's code is the nation mean WITHOUT that row,
    * (Σ_nation − y) / (n_nation − 1), so a row never sees its own label.
    * Nation sums are decimal-exact; the subtraction stays decimal; the
    * one division is the final double op. A single-member category
    * encodes NULL (no leave-one-out mean exists) rather than a fake 0.
    *
    * Scale shape: the per-category frame is |nations| rows — broadcast
    * back onto the fact scan, zero extra shuffle on the big side beyond
    * the orders⋈customer key join (co-partitionable at 100 TB). The
    * output pins the first 30 orders by key: the encode is row-wise, so
    * a bounded deterministic slice is the verifiable sample. */
  val targetEncode = QuerySpec(
    "q_target_encode",
    (s, d) => {
      val oc = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(
          col("o_orderkey"),
          col("c_nationkey").cast("int").as("nation"),
          col("o_totalprice").cast("decimal(18,2)").as("y"))
      val stats = oc.groupBy("nation").agg(
        count(lit(1)).as("cnt"),
        sum(col("y")).as("tot"))
      oc.join(broadcast(stats), Seq("nation"))
        .select(
          col("o_orderkey"), col("nation"),
          col("y").cast("double").as("price"),
          when(col("cnt") > 1L,
            (col("tot") - col("y")).cast("double") /
              (col("cnt") - 1L).cast("double")).as("loo_enc"))
        .orderBy("o_orderkey")
        .limit(30)
    },
    Some("""
      WITH oc AS (
        SELECT o_orderkey, CAST(c_nationkey AS INTEGER) AS nation,
               CAST(o_totalprice AS DECIMAL(18,2)) AS y
        FROM orders JOIN customer ON o_custkey = c_custkey
      ),
      st AS (
        SELECT nation, count(*) AS cnt, sum(y) AS tot
        FROM oc GROUP BY nation
      )
      SELECT o_orderkey, nation, CAST(y AS DOUBLE) AS price,
             CASE WHEN cnt > 1
                  THEN CAST(tot - y AS DOUBLE) / CAST(cnt - 1 AS DOUBLE)
             END AS loo_enc
      FROM oc JOIN st USING (nation)
      ORDER BY o_orderkey
      LIMIT 30
    """))

  /** χ² independence test of document source vs a length label
    * (n_chars ≥ 1000) — the classic categorical feature-relevance filter
    * before training a quality classifier. Observed cells, row totals,
    * and column totals are exact longs from three map-side-combinable
    * aggregates over one scan (the contingency table is tiny: sources ×
    * 2); expected = rt·ct/N and the cell contribution (o−e)²/e are
    * double arithmetic of identical shape in both engines. The χ²
    * TOTAL is the ordered fold over cells sorted by (source, label) —
    * the segment-fold float discipline: a commutative double sum would
    * be partition-order nondeterministic. */
  val chi2Feature = QuerySpec(
    "q_chi2_feature",
    (s, d) => {
      val lab = documents(s, d).select(
        col("source"),
        // when/otherwise, not a bool cast: an unknown length is NOT a
        // long doc — the oracle's CASE lands in ELSE 0, a NULL label
        // would open a phantom contingency column (hollow DegenGate)
        when(col("n_chars") >= 1000L, 1).otherwise(0).as("label"))
      val cells = lab.groupBy("source", "label").agg(count(lit(1)).as("obs"))
      val rows = lab.groupBy("source").agg(count(lit(1)).as("rt"))
      val cols = lab.groupBy("label").agg(count(lit(1)).as("ct"))
      val n = lab.agg(count(lit(1)).as("n"))
      val contrib = cells
        .join(broadcast(rows), "source")
        .join(broadcast(cols), "label")
        .crossJoin(broadcast(n))
        .select(
          col("source"), col("label"), col("obs"),
          ((col("rt") * col("ct")).cast("double") / col("n").cast("double"))
            .as("exp"))
        .withColumn("contrib",
          (col("obs").cast("double") - col("exp")) *
            (col("obs").cast("double") - col("exp")) / col("exp"))
      val total = contrib
        .agg(
          aggregate(
            expr("array_sort(collect_list(struct(source, label, contrib)))"),
            lit(0.0),
            (acc, c) => acc + c.getField("contrib")).as("chi2"),
          ((countDistinct(col("source")) - 1) *
            (countDistinct(col("label")) - 1)).as("dof"))
      contrib.crossJoin(broadcast(total))
        .select("source", "label", "obs", "exp", "contrib", "chi2", "dof")
        .orderBy("source", "label")
    },
    Some("""
      WITH lab AS (
        SELECT source,
               CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END AS label
        FROM documents
      ),
      cells AS (SELECT source, label, count(*) AS obs
                FROM lab GROUP BY source, label),
      rt AS (SELECT source, count(*) AS rt FROM lab GROUP BY source),
      ct AS (SELECT label, count(*) AS ct FROM lab GROUP BY label),
      n AS (SELECT count(*) AS n FROM lab),
      contrib AS (
        SELECT source, label, obs,
               CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS exp,
               (CAST(obs AS DOUBLE)
                  - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(obs AS DOUBLE)
                  - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) AS contrib
        FROM cells JOIN rt USING (source) JOIN ct USING (label)
             CROSS JOIN n
      ),
      tot AS (
        SELECT list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list(contrib ORDER BY source, label)),
                 (a, b) -> a + b) AS chi2,
               (count(DISTINCT source) - 1) * (count(DISTINCT label) - 1)
                 AS dof
        FROM contrib
      )
      SELECT source, label, obs, exp, contrib, chi2, dof
      FROM contrib CROSS JOIN tot
      ORDER BY source, label
    """))

  /** 5-fold cross-validated simple regression (l_extendedprice on
    * l_quantity), ENTIRELY from per-fold sufficient statistics: the fold
    * split is the deterministic l_orderkey % 5, each fold contributes
    * decimal-exact (n, Σx, Σy, Σxx, Σxy, Σyy), and fold f's TRAINING
    * stats are total − fold — the complement trick that makes k-fold CV
    * one aggregate pass instead of k training scans (the point at
    * 100 TB: the fact table is read once, not five times). OLS closed
    * form β = (nΣxy − ΣxΣy)/(nΣxx − Σx²) and the held-out RMSE from the
    * expanded Σ(y − α − βx)² — all double arithmetic of pinned shape
    * over exact operands, one sqrt (IEEE correctly-rounded) at the end.
    * Decimal headroom: products pinned to DECIMAL(30,4), sums
    * DECIMAL(38,4) — Σxx at 10¹¹ rows × 10¹⁰/value ≈ 10²¹ ≪ 10³⁴.
    *
    * Oracle subtlety (measured): DuckDB's DECIMAL(38,4)→DOUBLE cast is
    * NOT correctly rounded — 3 of the 5 fold sums here land 1 ULP off
    * the value Spark's BigDecimal.doubleValue (correctly rounded)
    * produces. Its VARCHAR→DOUBLE path IS correctly rounded
    * (fast_float), so the oracle routes every decimal→double conversion
    * through a string; both engines then start the float pipeline from
    * bit-identical operands. */
  val kfoldCv = QuerySpec(
    "q_kfold_cv",
    (s, d) => {
      val base = lineitem(s, d).select(
        (col("l_orderkey") % 5L).as("fold"),
        col("l_quantity").cast("decimal(18,2)").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").as("y"))
      val perFold = base.groupBy("fold").agg(
        count(lit(1)).as("fn"),
        sum(col("x")).as("fx"),
        sum(col("y")).as("fy"),
        sum((col("x") * col("x")).cast("decimal(30,4)")).as("fxx"),
        sum((col("x") * col("y")).cast("decimal(30,4)")).as("fxy"),
        sum((col("y") * col("y")).cast("decimal(30,4)")).as("fyy"))
      val tot = perFold.agg(
        sum("fn").as("tn"), sum("fx").as("tx"), sum("fy").as("ty"),
        sum("fxx").as("txx"), sum("fxy").as("txy"))
      perFold.crossJoin(broadcast(tot))
        .select(
          col("fold"),
          (col("tn") - col("fn")).as("train_n"),
          col("fn").as("test_n"),
          ((col("tn") - col("fn")).cast("double")).as("cn"),
          ((col("tx") - col("fx")).cast("double")).as("cx"),
          ((col("ty") - col("fy")).cast("double")).as("cy"),
          ((col("txx") - col("fxx")).cast("double")).as("cxx"),
          ((col("txy") - col("fxy")).cast("double")).as("cxy"),
          col("fn").cast("double").as("dn"),
          col("fx").cast("double").as("dx"),
          col("fy").cast("double").as("dy"),
          col("fxx").cast("double").as("dxx"),
          col("fxy").cast("double").as("dxy"),
          col("fyy").cast("double").as("dyy"))
        // try_divide: a fold with zero x-variance or an empty test side
        // (degenerate corpora) has NULL fit/rmse, not an ANSI error
        .withColumn("beta",
          expr("try_divide(cn * cxy - cx * cy, cn * cxx - cx * cx)"))
        .withColumn("alpha",
          expr("try_divide(cy, cn) - beta * try_divide(cx, cn)"))
        .withColumn("rmse", expr(
          "sqrt(try_divide(dyy - 2 * alpha * dy - 2 * beta * dxy" +
            " + dn * alpha * alpha + beta * beta * dxx" +
            " + 2 * alpha * beta * dx, dn))"))
        .select("fold", "train_n", "test_n", "beta", "alpha", "rmse")
        .orderBy("fold")
    },
    Some("""
      WITH base AS (
        SELECT l_orderkey % 5 AS fold,
               CAST(l_quantity AS DECIMAL(18,2)) AS x,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        FROM lineitem
      ),
      pf AS (
        SELECT fold, count(*) AS fn, sum(x) AS fx, sum(y) AS fy,
               sum(CAST(x * x AS DECIMAL(30,4))) AS fxx,
               sum(CAST(x * y AS DECIMAL(30,4))) AS fxy,
               sum(CAST(y * y AS DECIMAL(30,4))) AS fyy
        FROM base GROUP BY fold
      ),
      tot AS (
        SELECT sum(fn) AS tn, sum(fx) AS tx, sum(fy) AS ty,
               sum(fxx) AS txx, sum(fxy) AS txy
        FROM pf
      ),
      c AS (
        SELECT fold, CAST(tn - fn AS BIGINT) AS train_n, fn AS test_n,
               CAST(tn - fn AS DOUBLE) AS cn,
               CAST(CAST(tx - fx AS VARCHAR) AS DOUBLE) AS cx,
               CAST(CAST(ty - fy AS VARCHAR) AS DOUBLE) AS cy,
               CAST(CAST(txx - fxx AS VARCHAR) AS DOUBLE) AS cxx,
               CAST(CAST(txy - fxy AS VARCHAR) AS DOUBLE) AS cxy,
               CAST(fn AS DOUBLE) AS dn,
               CAST(CAST(fx AS VARCHAR) AS DOUBLE) AS dx,
               CAST(CAST(fy AS VARCHAR) AS DOUBLE) AS dy,
               CAST(CAST(fxx AS VARCHAR) AS DOUBLE) AS dxx,
               CAST(CAST(fxy AS VARCHAR) AS DOUBLE) AS dxy,
               CAST(CAST(fyy AS VARCHAR) AS DOUBLE) AS dyy
        FROM pf CROSS JOIN tot
      ),
      fit AS (
        SELECT *,
               (cn * cxy - cx * cy) / (cn * cxx - cx * cx) AS beta
        FROM c
      ),
      fit2 AS (
        SELECT *, cy / cn - beta * (cx / cn) AS alpha FROM fit
      )
      SELECT fold, train_n, test_n, beta, alpha,
             sqrt((dyy - 2 * alpha * dy - 2 * beta * dxy
                   + dn * alpha * alpha + beta * beta * dxx
                   + 2 * alpha * beta * dx) / dn) AS rmse
      FROM fit2
      ORDER BY fold
    """))

  /** Skip-gram training pairs (word2vec's input): for every token, its
    * context at distance 1 and 2 to the RIGHT (symmetric counts follow
    * by reflection; emitting one direction halves the shuffle). lead()
    * windows partitioned by doc_id replace the naive position self-join
    * — one hash exchange on doc_id, no join, and the window never
    * crosses documents so no global sort exists. Top-30 pairs by count
    * is the bounded verifiable slice (TakeOrdered, no full sort). */
  val skipgramPairs = QuerySpec(
    "q_skipgram_pairs",
    (s, d) => {
      val toks = fanOut(s, documents(s, d))
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "pos", "w")
      val win = Window.partitionBy("doc_id").orderBy("pos")
      val pairs = toks
        .select(
          col("w").as("w1"),
          lead(col("w"), 1).over(win).as("n1"),
          lead(col("w"), 2).over(win).as("n2"))
      pairs.select(col("w1"), col("n1").as("w2"), lit(1).as("dist"))
        .filter(col("w2").isNotNull)
        .union(pairs.select(col("w1"), col("n2").as("w2"), lit(2).as("dist"))
          .filter(col("w2").isNotNull))
        .groupBy("w1", "w2", "dist").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2"), col("dist"))
        .limit(30)
    },
    Some("""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ),
      toks AS (
        SELECT doc_id, pos, ws[pos] AS w
        FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, len(ws))) AS pos
              FROM w)
      ),
      led AS (
        SELECT w AS w1,
               lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS n1,
               lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS n2
        FROM toks
      ),
      pairs AS (
        SELECT w1, n1 AS w2, 1 AS dist FROM led WHERE n1 IS NOT NULL
        UNION ALL
        SELECT w1, n2 AS w2, 2 AS dist FROM led WHERE n2 IS NOT NULL
      )
      SELECT w1, w2, CAST(dist AS INTEGER) AS dist,
             CAST(count(*) AS BIGINT) AS cnt
      FROM pairs
      GROUP BY w1, w2, dist
      ORDER BY cnt DESC, w1, w2, dist
      LIMIT 30
    """))

  /** k-NN classification over the embeddings table: the 10 lowest-id
    * vectors are the unlabeled queries, every other vector votes through
    * its label — majority of the 5 nearest by cosine, ties to the
    * smaller label (pinned, not arbitrary). The query set is BOUNDED and
    * broadcast, so the corpus is scanned once with no shuffle on the big
    * side until the per-query top-5 (a 10-partition window over ≤ 10·N
    * scored rows — at real scale the IVF route in q_similarity_ann
    * replaces the brute-force scorer, same vote tail). Scores rank on
    * round(cos, 6) with a vec_id tie-break: both engines accumulate the
    * dot product in the same sequential double order, and the rounding
    * plus pinned tie-break makes the neighbor SET identical. */
  val knnClassify = QuerySpec(
    "q_knn_classify",
    (s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("label"),
          Similarity.asDouble(col("embedding")).as("v"))
      val queries = emb.filter(col("vec_id") < 10L)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val scored = emb.filter(col("vec_id") >= 10L)
        .crossJoin(broadcast(queries))
        .select(
          col("qid"), col("vec_id"), col("label"),
          round(graft.functions.CosineSim.cosine_sim(col("v"), col("qv")), 6)
            .as("cos"))
      val top = scored
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("vec_id").asc)))
        .filter(col("rk") <= 5)
      top.groupBy("qid", "label").agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(
          Window.partitionBy("qid")
            .orderBy(col("votes").desc, col("label").asc)))
        .filter(col("vr") === 1)
        .select(col("qid"), col("label").as("pred_label"), col("votes"))
        .orderBy("qid")
    },
    Some("""
      WITH q AS (
        SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
      ),
      scored AS (
        SELECT q.qid, e.vec_id, e.label,
               round(list_inner_product(e.embedding::DOUBLE[], q.qv)
                     / (sqrt(list_inner_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                        * sqrt(list_inner_product(q.qv, q.qv))), 6) AS cos
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id >= 10
      ),
      top AS (
        SELECT qid, label,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, vec_id ASC) AS rk
        FROM scored
      ),
      votes AS (
        SELECT qid, label, count(*) AS votes
        FROM top WHERE rk <= 5
        GROUP BY qid, label
      )
      SELECT qid, CAST(label AS INTEGER) AS pred_label, votes
      FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                         ORDER BY votes DESC, label ASC)
                        AS vr
            FROM votes)
      WHERE vr = 1
      ORDER BY qid
    """))

  /** Weight-of-evidence encoding + information value of the market
    * segment against the urgent-order label — the credit-scoring
    * categorical diagnostic: WOE_c = ln((good_c/G)/(bad_c/B)), written
    * as ONE log of a ratio of int64 cross-products (good_c·B vs
    * bad_c·G — exact until ~3·10⁹ events per cell), and
    * IV = Σ_c (good_c/G − bad_c/B)·WOE_c. The IV total is a seeded
    * fold in CATEGORY order on both sides (Spark: aggregate over the
    * sorted collect_list; DuckDB: list_reduce over 0.0 prepended to
    * the ORDER BY list) — never an unordered double sum. One
    * map-side-combinable contingency aggregate; the 5-row category
    * frame broadcasts back, so the fact scan is the only corpus-sized
    * stage at 100 TB. */
  val woeIv = QuerySpec(
    "q_woe_iv",
    (s, d) => {
      val base = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          // when/otherwise, not a bool cast: a NULL priority is NOT
          // urgent — the oracle's CASE lands in ELSE 0, a NULL pos would
          // NULL-poison sum(1 - pos) (hollow DegenGate)
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("pos"))
      val perCat = base.groupBy("seg").agg(
        sum(col("pos")).as("good"),
        sum(lit(1L) - col("pos")).as("bad"))
      val tot = perCat.agg(sum("good").as("g_tot"), sum("bad").as("b_tot"))
      val withWoe = perCat.crossJoin(broadcast(tot))
        // ln is NOT correctly rounded on either engine (libm vs
        // Math.log can differ by 1 ulp on unlucky inputs — observed at
        // sf0.001); rounding at 1e-9 FIRST makes every downstream
        // product/sum run on bit-identical inputs (the q_pagerank
        // convention)
        // try_divide: a corpus with zero bads (or goods) in total makes
        // WOE's odds undefined — NULL, exactly DuckDB's x/0 (log of the
        // NULL ratio is NULL on both engines)
        .withColumn("woe",
          round(log(try_divide(
            (col("good") * col("b_tot")).cast("double"),
            (col("bad") * col("g_tot")).cast("double"))), 9))
        .withColumn("iv_term",
          (try_divide(col("good").cast("double"),
            col("g_tot").cast("double"))
            - try_divide(col("bad").cast("double"),
              col("b_tot").cast("double")))
            * col("woe"))
      val ivTotal = withWoe
        .agg(array_sort(collect_list(struct(col("seg"), col("iv_term"))))
          .as("ps"))
        .select(aggregate(expr("transform(ps, p -> p.iv_term)"),
          lit(0.0), (acc, x) => acc + x).as("iv_total"))
      withWoe.crossJoin(broadcast(ivTotal))
        .select(col("seg"), col("good"), col("bad"), col("woe"),
          col("iv_term"), col("iv_total"))
        .orderBy("seg")
    },
    Some("""
      WITH base AS (
        SELECT c.c_mktsegment AS seg,
               CAST(CASE WHEN o.o_orderpriority = '1-URGENT'
                    THEN 1 ELSE 0 END AS BIGINT) AS pos
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      ),
      per_cat AS (
        SELECT seg, CAST(sum(pos) AS BIGINT) AS good,
               CAST(sum(1 - pos) AS BIGINT) AS bad
        FROM base GROUP BY seg
      ),
      tot AS (SELECT CAST(sum(good) AS BIGINT) AS g_tot,
                     CAST(sum(bad) AS BIGINT) AS b_tot FROM per_cat),
      woe AS (
        SELECT seg, good, bad,
               round(ln(CAST(good * b_tot AS DOUBLE)
                        / CAST(bad * g_tot AS DOUBLE)), 9) AS woe,
               (CAST(good AS DOUBLE) / CAST(g_tot AS DOUBLE)
                 - CAST(bad AS DOUBLE) / CAST(b_tot AS DOUBLE))
                 * round(ln(CAST(good * b_tot AS DOUBLE)
                            / CAST(bad * g_tot AS DOUBLE)), 9) AS iv_term
        FROM per_cat CROSS JOIN tot
      ),
      iv AS (
        SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(iv_term ORDER BY seg)),
                           (a, b) -> a + b) AS iv_total
        FROM woe
      )
      SELECT seg, good, bad, woe.woe, iv_term, iv.iv_total
      FROM woe CROSS JOIN iv
      ORDER BY seg
    """))

  /** Pointwise mutual information over [[skipgramPairs]]' context
    * windows — the collocation detector behind phrase mining and
    * embedding objectives: PMI = ln((c₁₂/N)/((c₁/T)·(c₂/T))), pairs
    * from the same lead-window extraction (distance ≤ 2 rightward, one
    * doc-partitioned window, no position self-join), unigrams from one
    * token count. Every count is an exact long, so the ln argument is
    * one exact rational — identical double both engines, rounded at
    * 1e-6 — and the support floor (c₁₂ ≥ 20) plus top-30 keeps the
    * output the bounded verifiable slice (TakeOrdered, no full sort). */
  val pmi = QuerySpec(
    "q_pmi",
    (s, d) => {
      val toks = fanOut(s, documents(s, d))
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "pos", "w")
        .localCheckpoint() // pairs AND unigrams read it
      val win = Window.partitionBy("doc_id").orderBy("pos")
      val led = toks.select(
        col("w").as("w1"),
        lead(col("w"), 1).over(win).as("n1"),
        lead(col("w"), 2).over(win).as("n2"))
      val pairs = led.select(col("w1"), col("n1").as("w2"))
        .filter(col("w2").isNotNull)
        .union(led.select(col("w1"), col("n2").as("w2"))
          .filter(col("w2").isNotNull))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val uni = toks.groupBy(col("w").as("tok"))
        .agg(count(lit(1)).as("c"))
      val nPairs = pairs.agg(sum("c12").as("np"))
      val nToks = uni.agg(sum("c").as("t"))
      pairs.filter(col("c12") >= 20)
        .join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
        .crossJoin(broadcast(nPairs)).crossJoin(broadcast(nToks))
        .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
          round(log(
            (col("c12").cast("double") / col("np").cast("double")) /
              ((col("c1").cast("double") / col("t").cast("double")) *
                (col("c2").cast("double") / col("t").cast("double")))), 6)
            .as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(30)
    },
    Some("""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ),
      toks AS (
        SELECT doc_id, pos, ws[pos] AS w
        FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, len(ws))) AS pos
              FROM w)
      ),
      led AS (
        SELECT w AS w1,
               lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS n1,
               lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS n2
        FROM toks
      ),
      pairs AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
          SELECT w1, n1 AS w2 FROM led WHERE n1 IS NOT NULL
          UNION ALL
          SELECT w1, n2 FROM led WHERE n2 IS NOT NULL)
        GROUP BY w1, w2
      ),
      uni AS (
        SELECT w AS tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w
      ),
      np AS (SELECT CAST(sum(c12) AS BIGINT) AS np FROM pairs),
      tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni)
      SELECT p.w1, p.w2, p.c12, u1.c AS c1, u2.c AS c2,
             round(ln((CAST(p.c12 AS DOUBLE) / CAST(np.np AS DOUBLE))
                      / ((CAST(u1.c AS DOUBLE) / CAST(tt.t AS DOUBLE))
                         * (CAST(u2.c AS DOUBLE) / CAST(tt.t AS DOUBLE)))),
                   6) AS pmi
      FROM pairs p
      JOIN uni u1 ON u1.tok = p.w1
      JOIN uni u2 ON u2.tok = p.w2
      CROSS JOIN np CROSS JOIN tt
      WHERE p.c12 >= 20
      ORDER BY pmi DESC, p.w1, p.w2
      LIMIT 30
    """))

  val all: Seq[QuerySpec] = Seq(
    histogram, targetEncode, chi2Feature, kfoldCv, skipgramPairs,
    knnClassify, woeIv, pmi)
}
