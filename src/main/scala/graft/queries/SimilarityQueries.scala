package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.Similarity

/** Similarity search over the embeddings table (SURVEY §2b E3/E6 — the
  * ArrayType(Float) column IS the multimodal-column surface exercised
  * relationally).
  */
object SimilarityQueries {

  final val ProbeId = 0L

  /** E3 baseline: exact brute-force cosine top-20 vs the vec_id=0 probe.
    * Scoring runs through the custom codegen'd CosineSim Expression (fused
    * dot+norms, single pass); DuckDB recomputes with list_inner_product —
    * identical sequential double accumulation, so values hash-match. */
  val similarityTopk = QuerySpec(
    "q_similarity_topk",
    (s, d) => {
      val emb = embeddings(s, d)
      val probe = Similarity.probeVector(emb, "vec_id", ProbeId)
      Similarity.bruteForceTopK(emb, "vec_id", probe, k = 20, excludeId = Some(ProbeId))
    },
    Some(s"""
      WITH probe AS (
        SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = $ProbeId
      )
      SELECT vec_id, label,
             round(list_inner_product(embedding::DOUBLE[], p)
                   / (sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_inner_product(p, p))), 6) AS cos
      FROM embeddings, probe
      WHERE vec_id <> $ProbeId
      ORDER BY cos DESC, vec_id ASC
      LIMIT 20
    """))

  /** E3 scale path: IVF — coarse quantizer (local seeded Lloyd's over a
    * key-hash sample, Similarity.ivfAssign — layout-independent by
    * construction), probe the 8 nearest of 16 cells, brute-force within
    * (synthetic embeddings are near-uniform, so the quantizer needs a
    * generous nProbe; clustered real corpora prune much harder).
    * Cell MEMBERSHIP is engine-specific → verdict oracle below;
    * EntrySpec asserts recall ≥ 0.85 at sf0.001 against the exact top-k. */
  val similarityAnn = QuerySpec(
    "q_similarity_ann",
    (s, d) => {
      val emb = embeddings(s, d)
      val probe = Similarity.probeVector(emb, "vec_id", ProbeId)
      val (assigned, centroids) = Similarity.ivfAssign(s, emb, nCells = 16)
      val approx = Similarity.ivfTopK(assigned, centroids, "vec_id", probe,
        k = 20, nProbe = 8, excludeId = Some(ProbeId))
      // The MEMBER LIST of an IVF top-k is engine-specific (which cells
      // the quantizer carved), so the compared output is the corpus size
      // plus the recall verdict vs the exact brute-force top-20, computed
      // in-plan and pinned constant-true by the oracle (q_median_approx
      // pattern; EntrySpec asserts a measured ≥ 0.85 bound on the ops). The
      // full quantize→assign→probe pipeline still runs.
      val exact = Similarity.bruteForceTopK(emb, "vec_id", probe,
        k = 20, excludeId = Some(ProbeId))
      val hits = approx.select("vec_id")
        .join(exact.select("vec_id"), "vec_id")
        .agg(count(lit(1)).as("__hits"))
      // Bar = measured minus 2-hit headroom: graft.tools.RecallProbe
      // measures this exact config (nCells 16, nProbe 8, probe vec 0) at
      // 19/14/20 of 20 across sf0.001/0.01/0.1 — deterministic (seeded
      // quantizer, fixed corpus), so the bar is 14−2 = 12. The binding
      // point is sf0.01: near-uniform synthetic embeddings are IVF's
      // worst case (cell boundaries carve the true neighborhood).
      emb.agg(count(lit(1)).as("n_vectors")).crossJoin(hits)
        .select(
          col("n_vectors"), lit(20).as("k"),
          // bar capped by the ELIGIBLE count (n−1, probe excluded): a
          // degenerate corpus with fewer candidates than the bar can
          // only return what exists — the oracle's constant 1 then
          // means "all that exist were found"
          (col("__hits") >= least(lit(12L),
            greatest(col("n_vectors") - 1L, lit(0L)))).cast("int")
            .as("recall_ok"))
    },
    Some("""
      SELECT count(*) AS n_vectors, 20 AS k, 1 AS recall_ok
      FROM embeddings
    """))

  /** Embedding-cosine near-duplicate pairs (the vector-space sibling of
    * shingle-Jaccard dedup): top-20 most-similar vector pairs, blocked by
    * label. Blocking bounds the pair space exactly like lang-blocking in
    * q_dedup_near; the 100 TB path swaps the block for LSH buckets
    * (BucketedRandomProjectionLSH) or IVF cells — candidate generation is
    * then an equi-join, same shape as Dedup.lshBands. */
  val dedupEmbed = QuerySpec(
    "q_dedup_embed",
    (s, d) => {
      val e = embeddings(s, d)
      def side(n: String) = e.select(
        col("label"),
        col("vec_id").as(s"id_$n"),
        Similarity.asDouble(col("embedding")).as(s"v_$n"))
      side("a").join(side("b"), Seq("label"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos", round(
          graft.functions.CosineSim.cosine_sim(col("v_a"), col("v_b")), 6))
        .select("label", "id_a", "id_b", "cos")
        .orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
        .limit(20)
    },
    Some("""
      SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                      * sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      ORDER BY cos DESC, id_a ASC, id_b ASC
      LIMIT 20
    """))

  /** E3 scale path, LSH flavor: BucketedRandomProjectionLSH bucket-pruned
    * nearest neighbors (engine-specific hash family → no SQL oracle;
    * EntrySpec bounds recall vs the exact euclidean top-k). */
  val similarityLsh = QuerySpec(
    "q_similarity_lsh",
    (s, d) => {
      val emb = embeddings(s, d)
      val probe = Similarity.probeVector(emb, "vec_id", ProbeId)
      val approx = Similarity.lshTopK(s, emb, "vec_id", probe,
        k = 20, excludeId = Some(ProbeId))
      // Same verdict shape as q_similarity_ann: the bucket membership is
      // hash-family-specific, the recall vs the exact EUCLIDEAN top-20
      // (the family's own metric) is the contract. EntrySpec asserts the
      // measured ≥ 0.85 bound on the ops.
      val p = array(probe.map(lit): _*)
      val exact = emb.filter(col("vec_id") =!= ProbeId)
        .withColumn("d2",
          aggregate(
            zip_with(Similarity.asDouble(col("embedding")), p,
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x))
        .orderBy(col("d2").asc, col("vec_id").asc).limit(20)
      val hits = approx.select("vec_id")
        .join(exact.select("vec_id"), "vec_id")
        .agg(count(lit(1)).as("__hits"))
      // RecallProbe measures this config (4 hash tables, bucket len 2.0,
      // probe vec 0) at 19/18/20 of 20 across sf0.001/0.01/0.1;
      // deterministic seed → bar = binding 18 minus 2-hit headroom = 16.
      emb.agg(count(lit(1)).as("n_vectors")).crossJoin(hits)
        .select(
          col("n_vectors"), lit(20).as("k"),
          // bar capped by the ELIGIBLE count (n−1, probe excluded): a
          // degenerate corpus with fewer candidates than the bar can
          // only return what exists — the oracle's constant 1 then
          // means "all that exist were found"
          (col("__hits") >= least(lit(16L),
            greatest(col("n_vectors") - 1L, lit(0L)))).cast("int")
            .as("recall_ok"))
    },
    Some("""
      SELECT count(*) AS n_vectors, 20 AS k, 1 AS recall_ok
      FROM embeddings
    """))

  /** Batch similarity serving: top-5 neighbors for EIGHT probe vectors in
    * one pass — the retrieval shape of RAG/eval pipelines (a probe BATCH,
    * not one query at a time). The probe side is tiny and explicitly
    * broadcast, so the corpus scans once and the per-probe ranking is a
    * window on the probe key; at 100 TB the corpus side stays partitioned
    * in place and only the probe batch moves. */
  val batchAnn = QuerySpec(
    "q_batch_ann",
    (s, d) => {
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 8)
        .select(
          col("vec_id").as("probe_id"),
          Similarity.asDouble(col("embedding")).as("p"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      emb.filter(col("vec_id") >= 8)
        .crossJoin(broadcast(probes))
        .withColumn("cos", round(
          graft.functions.CosineSim.cosine_sim(
            Similarity.asDouble(col("embedding")), col("p")), 6))
        // cast to long: DuckDB row_number() is BIGINT, and the driver's
        // strict hash is width-sensitive even where values agree
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("probe_id", "rank", "vec_id", "cos")
        .orderBy("probe_id", "rank")
    },
    Some("""
      SELECT probe_id, rank, vec_id, cos
      FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
               round(list_inner_product(c.embedding::DOUBLE[], p.embedding::DOUBLE[])
                     / (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                        * sqrt(list_inner_product(p.embedding::DOUBLE[], p.embedding::DOUBLE[]))), 6) AS cos,
               row_number() OVER (PARTITION BY p.vec_id
                                  ORDER BY round(list_inner_product(c.embedding::DOUBLE[], p.embedding::DOUBLE[])
                                                 / (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                                                    * sqrt(list_inner_product(p.embedding::DOUBLE[], p.embedding::DOUBLE[]))), 6) DESC,
                                           c.vec_id ASC) AS rank
        FROM embeddings c JOIN embeddings p ON p.vec_id < 8 AND c.vec_id >= 8
      )
      WHERE rank <= 5
      ORDER BY probe_id, rank
    """))

  /** E3 compressed-domain path: product quantization (Faiss IVF-PQ's
    * compression half) — codebooks from the bounded key-hash sample,
    * corpus encoded to an m-byte code column, then the two-stage query:
    * ADC scan over CODES ONLY (literal lookup tables, never touching the
    * stored embedding — at 100 TB that's scanning m bytes/vector instead
    * of 4·dim) followed by exact re-rank of the 512-row shortlist. The
    * code assignment is engine-specific → verdict oracle (q_similarity_ann
    * pattern): recall of the re-ranked top-20 vs the exact euclidean
    * top-20, measured 20/20/18 at sf0.001/0.01/0.1 (graft.tools
    * .RecallProbe, deterministic seeded codebooks), pinned at the binding
    * 18 minus 2-hit headroom = 16 (the near-uniform synthetic embeddings
    * are PQ's worst case; clustered real corpora quantize far tighter). */
  val similarityPq = QuerySpec(
    "q_similarity_pq",
    (s, d) => {
      val emb = embeddings(s, d)
      val probe = Similarity.probeVector(emb, "vec_id", ProbeId)
      val books = Similarity.pqTrain(s, emb, m = 8, k = 16)
      val encoded = Similarity.pqEncode(s, emb, books)
      val approx = Similarity.pqTopK(encoded, books, "vec_id", probe,
        k = 20, shortlist = 512, excludeId = Some(ProbeId))
      val p = array(probe.map(lit): _*)
      val exact = emb.filter(col("vec_id") =!= ProbeId)
        .withColumn("d2",
          aggregate(
            zip_with(Similarity.asDouble(col("embedding")), p,
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x))
        .orderBy(col("d2").asc, col("vec_id").asc).limit(20)
      val hits = approx.select("vec_id")
        .join(exact.select("vec_id"), "vec_id")
        .agg(count(lit(1)).as("__hits"))
      emb.agg(count(lit(1)).as("n_vectors")).crossJoin(hits)
        .select(
          col("n_vectors"), lit(20).as("k"),
          // bar capped by the ELIGIBLE count (n−1, probe excluded): a
          // degenerate corpus with fewer candidates than the bar can
          // only return what exists — the oracle's constant 1 then
          // means "all that exist were found"
          (col("__hits") >= least(lit(16L),
            greatest(col("n_vectors") - 1L, lit(0L)))).cast("int")
            .as("recall_ok"))
    },
    Some("""
      SELECT count(*) AS n_vectors, 20 AS k, 1 AS recall_ok
      FROM embeddings
    """))

  /** E3 scale path, the full two-level index: IVF cells × PQ codes
    * (Similarity.ivfPqTopK scaladoc has the 100 TB multiply: the scan
    * touches nProbe/nCells of the rows and m bytes of each). Membership
    * is doubly engine-specific (cell carving × codebook geometry) →
    * the q_similarity_ann verdict shape, recall pinned vs the exact
    * euclidean top-20 computed in-plan. */
  val ivfPq = QuerySpec(
    "q_ivf_pq",
    (s, d) => {
      val emb = embeddings(s, d)
      val probe = Similarity.probeVector(emb, "vec_id", ProbeId)
      val (assigned, centroids) = Similarity.ivfAssign(s, emb, nCells = 16)
      val books = Similarity.pqTrain(s, emb, m = 8, k = 16)
      val encoded = Similarity.pqEncode(s, assigned, books)
      val approx = Similarity.ivfPqTopK(encoded, centroids, books, "vec_id",
        probe, k = 20, nProbe = 8, shortlist = 256, excludeId = Some(ProbeId))
      val p = array(probe.map(lit): _*)
      val exact = emb.filter(col("vec_id") =!= ProbeId)
        .withColumn("d2",
          aggregate(
            zip_with(Similarity.asDouble(col("embedding")), p,
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x))
        .orderBy(col("d2").asc, col("vec_id").asc).limit(20)
      val hits = approx.select("vec_id")
        .join(exact.select("vec_id"), "vec_id")
        .agg(count(lit(1)).as("__hits"))
      // RecallProbe at this exact operating point (nProbe 8/16 cells,
      // shortlist 256, probe vec 0): 19/14/16 of 20 across
      // sf0.001/0.01/0.1 — the two prune levels compound, so the bar is
      // the binding 14 minus 2-hit headroom = 12 (above, the single-level
      // paths hold 16). Deterministic: seeded quantizer AND codebooks.
      emb.agg(count(lit(1)).as("n_vectors")).crossJoin(hits)
        .select(
          col("n_vectors"), lit(20).as("k"),
          // bar capped by the ELIGIBLE count (n−1, probe excluded): a
          // degenerate corpus with fewer candidates than the bar can
          // only return what exists — the oracle's constant 1 then
          // means "all that exist were found"
          (col("__hits") >= least(lit(12L),
            greatest(col("n_vectors") - 1L, lit(0L)))).cast("int")
            .as("recall_ok"))
    },
    Some("""
      SELECT count(*) AS n_vectors, 20 AS k, 1 AS recall_ok
      FROM embeddings
    """))

  /** ANN index persistence round-trip (VERDICT r8 item 2): train the full
    * IVF-PQ index (quantizer, codebooks, encoded corpus), SAVE all three
    * artifacts as parquet, LOAD them back, and answer the q_ivf_pq probe
    * from the loaded index — the train-once / serve-many shape a 100 TB
    * deployment runs (per-query retraining is a gate-harness convenience,
    * not a design). The verdict requires the loaded-index top-20 to equal
    * the freshly-trained top-20 EXACTLY (same (vec_id, d2) set): every
    * stage is deterministic and parquet round-trips ints and IEEE floats
    * losslessly, so any divergence is a persistence defect. */
  val annPersist = QuerySpec(
    "q_ann_persist",
    (s, d) => {
      val emb = embeddings(s, d)
      val probe = Similarity.probeVector(emb, "vec_id", ProbeId)
      val (assigned, centroids) = Similarity.ivfAssign(s, emb, nCells = 16)
      val books = Similarity.pqTrain(s, emb, m = 8, k = 16)
      val encoded = Similarity.pqEncode(s, assigned, books)
      val dir = graft.util.TempDirs.scratch("graft-ann-index-").toString
      Similarity.saveCentroids(s, dir, centroids)
      Similarity.saveCodebooks(s, dir, books)
      // clustered by cell: the loaded probe's cell filter partition-prunes
      Similarity.saveCodes(encoded, dir, partitionCols = Seq("cluster"))
      val loadedCentroids = Similarity.loadCentroids(s, dir)
      val loadedBooks = Similarity.loadCodebooks(s, dir)
      val loadedCodes = Similarity.loadCodes(s, dir)
      def topk(codes: org.apache.spark.sql.DataFrame,
          cents: Array[Array[Double]],
          bks: Array[Array[Array[Double]]]) =
        Similarity.ivfPqTopK(codes, cents, bks, "vec_id", probe,
          k = 20, nProbe = 8, shortlist = 256, excludeId = Some(ProbeId))
          .select("vec_id", "d2")
      val matches = topk(encoded, centroids, books)
        .join(topk(loadedCodes, loadedCentroids, loadedBooks),
          Seq("vec_id", "d2"))
        .agg(count(lit(1)).as("__same"))
      emb.agg(count(lit(1)).as("n_vectors")).crossJoin(matches)
        .select(col("n_vectors"), lit(20L).as("k"),
          // capped by the eligible count (see the recall_ok caps above)
          (col("__same") === least(lit(20L),
            greatest(col("n_vectors") - 1L, lit(0L)))).cast("int")
            .as("persist_ok"))
    },
    Some("""
      SELECT count(*) AS n_vectors, CAST(20 AS BIGINT) AS k, 1 AS persist_ok
      FROM embeddings
    """))

  /** Incremental index maintenance (the nightly-ingest shape): train the
    * IVF-PQ index on HALF the corpus, persist it, then assign+encode the
    * other half against the LOADED artifacts and APPEND its files —
    * growing the index without retraining or rewriting. The verdict
    * requires (1) the grown index to be row-identical (vec_id, cluster,
    * code) to a ONE-SHOT encode of the full corpus with the same
    * artifacts — assignment depends only on (embedding, centroids,
    * codebooks), and parquet round-trips both losslessly — and (2) the
    * probe's top-20 answered from the grown index to equal the one-shot
    * answer exactly. The gate runs on a hash-selected HALF of the corpus
    * (vec_id % 2 = 0, which keeps the probe row): the equivalence being
    * proven is per-row deterministic, so corpus size buys no extra
    * assertion strength — it only buys bench seconds (VERDICT r10
    * item 5). */
  val annAppend = QuerySpec(
    "q_ann_append",
    (s, d) => {
      val emb = embeddings(s, d).filter(pmod(col("vec_id"), lit(2)) === 0)
      val base = emb.filter(pmod(col("vec_id"), lit(4)) === 0)
      val delta = emb.filter(pmod(col("vec_id"), lit(4)) === 2)
      val (baseAssigned, centroids) = Similarity.ivfAssign(s, base, nCells = 16)
      val books = Similarity.pqTrain(s, base, m = 8, k = 16)
      val dir = graft.util.TempDirs.scratch("graft-ann-append-").toString
      Similarity.saveCentroids(s, dir, centroids)
      Similarity.saveCodebooks(s, dir, books)
      Similarity.saveCodes(Similarity.pqEncode(s, baseAssigned, books),
        dir, partitionCols = Seq("cluster"))
      // the nightly batch: everything from the LOADED artifacts
      val lc = Similarity.loadCentroids(s, dir)
      val lb = Similarity.loadCodebooks(s, dir)
      Similarity.appendCodes(
        Similarity.pqEncode(s, Similarity.ivfAssignWith(s, delta, lc), lb),
        dir, partitionCols = Seq("cluster"))
      val grown = Similarity.loadCodes(s, dir)
      // materialized ONCE: both the row-identity check and the top-k
      // twin consume the one-shot encode, and they are separate plan
      // subtrees — without this the full corpus would encode twice
      val oneShot = graft.ops.Checkpoints.materialize(
        Similarity.pqEncode(s,
          Similarity.ivfAssignWith(s, emb, centroids), books))
      def narrow(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "cluster", "code")
      val same = narrow(grown).join(narrow(oneShot),
          Seq("vec_id", "cluster", "code"))
        .agg(count(lit(1)).as("__same"))
      val probe = Similarity.probeVector(emb, "vec_id", ProbeId)
      def topk(codes: org.apache.spark.sql.DataFrame) =
        Similarity.ivfPqTopK(codes, centroids, books, "vec_id", probe,
          k = 20, nProbe = 8, shortlist = 256, excludeId = Some(ProbeId))
          .select("vec_id", "d2")
      val tk = topk(grown).join(topk(oneShot), Seq("vec_id", "d2"))
        .agg(count(lit(1)).as("__tk"))
      emb.agg(count(lit(1)).as("n_vectors")).crossJoin(same).crossJoin(tk)
        .select(col("n_vectors"),
          (col("__same") === col("n_vectors")).cast("int").as("append_ok"),
          // capped by the eligible count (see the recall_ok caps)
          (col("__tk") === least(lit(20L),
            greatest(col("n_vectors") - 1L, lit(0L)))).cast("int")
            .as("topk_ok"))
    },
    Some("""
      SELECT count(*) AS n_vectors, 1 AS append_ok, 1 AS topk_ok
      FROM embeddings WHERE vec_id % 2 = 0
    """))

  /** Codes-table compaction (VERDICT r9 item 3): [[Similarity.appendCodes]]
    * grows one file set per nightly batch — at 100 TB that is the classic
    * small-files death (a probe pays a parquet-footer open per tiny file;
    * the namenode pays the inode count). This gate builds the append-only
    * shape deliberately — save the first third, append two more batches
    * (two appends build the same hazard as three at two-thirds the write
    * cost, VERDICT r10 item 5) — then runs [[Similarity.compactCodes]]
    * (bin-pack rewrite to one file per cell partition, atomic POINTER
    * swap since r11 — reader-safe, see the operator's scaladoc) and
    * requires
    * (1) the compacted table row-identical (vec_id, cluster, code) to the
    * one-shot encode, (2) the probe's top-20 from the compacted index
    * exactly equal to the pre-compaction answer, and (3) the data-file
    * count strictly reduced. */
  val annCompact = QuerySpec(
    "q_ann_compact",
    (s, d) => {
      val emb = embeddings(s, d)
      val (assigned, centroids) = Similarity.ivfAssign(s, emb, nCells = 16)
      val books = Similarity.pqTrain(s, emb, m = 8, k = 16)
      val dir = graft.util.TempDirs.scratch("graft-ann-compact-").toString
      Similarity.saveCentroids(s, dir, centroids)
      Similarity.saveCodebooks(s, dir, books)
      // materialized ONCE: three batch writes, the row-identity check,
      // and the top-k twin all consume the same encode
      val encoded = graft.ops.Checkpoints.materialize(
        Similarity.pqEncode(s, assigned, books))
      (0 until 3).foreach { b =>
        val batch = encoded.filter(pmod(col("vec_id"), lit(3)) === b)
        if (b == 0) Similarity.saveCodes(batch, dir, Seq("cluster"))
        else Similarity.appendCodes(batch, dir, Seq("cluster"))
      }
      val before = Similarity.codesFileCount(s, dir)
      // one file per non-empty cell is the bin-pack floor: a degenerate
      // corpus whose appends never split a cell is already minimal, and
      // "strictly fewer" would demand the impossible (bounded driver
      // count: ≤ nCells rows through the checkpointed encode)
      val floorFiles = encoded.select("cluster").distinct().count()
      Similarity.compactCodes(s, dir, Seq("cluster"))
      val after = Similarity.codesFileCount(s, dir)
      val compacted = Similarity.loadCodes(s, dir)
      val probe = Similarity.probeVector(emb, "vec_id", ProbeId)
      def topk(codes: org.apache.spark.sql.DataFrame) =
        Similarity.ivfPqTopK(codes, centroids, books, "vec_id", probe,
          k = 20, nProbe = 8, shortlist = 256, excludeId = Some(ProbeId))
          .select("vec_id", "d2")
      val tk = topk(compacted).join(topk(encoded), Seq("vec_id", "d2"))
        .agg(count(lit(1)).as("__tk"))
      def narrow(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "cluster", "code")
      val same = narrow(compacted).join(narrow(encoded),
          Seq("vec_id", "cluster", "code"))
        .agg(count(lit(1)).as("__same"))
      emb.agg(count(lit(1)).as("n_vectors")).crossJoin(same).crossJoin(tk)
        .select(col("n_vectors"),
          (col("__same") === col("n_vectors")).cast("int").as("rows_ok"),
          // capped by the eligible count (see the recall_ok caps)
          (col("__tk") === least(lit(20L),
            greatest(col("n_vectors") - 1L, lit(0L)))).cast("int")
            .as("topk_ok"),
          // measured driver-side around the swap — strictly fewer files,
          // unless the table was already at the bin-pack floor
          lit(if (after < before || before == floorFiles) 1 else 0)
            .as("compacted_ok"))
    },
    Some("""
      SELECT count(*) AS n_vectors, 1 AS rows_ok, 1 AS topk_ok,
             1 AS compacted_ok
      FROM embeddings
    """))

  /** SemDeDup semantic dedup — cluster-then-prune over the embedding
    * space (Similarity.semDedup scaladoc has the 100 TB shape: pair work
    * is Σ|cluster|², k sized to the corpus). k = 8 deterministic
    * lowest-id seeds, threshold 0.42 (the synthetic embeddings are
    * near-uniform — max in-cluster cosine ≈ 0.49 — so a web-corpus 0.9x
    * threshold would drop nothing; 0.42 exercises real drops at every
    * SF). Fully SQL-expressible: the oracle replays the same assignment
    * and the same rounded-cosine prune. */
  val semDedup = QuerySpec(
    "q_semdedup",
    (s, d) =>
      Similarity.semDedup(fanOut(s, embeddings(s, d)),
          "vec_id", "embedding", k = 8, threshold = 0.42)
        .orderBy("vec_id"),
    Some("""
      WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
                 FROM embeddings ORDER BY vec_id LIMIT 8),
      d AS (
        SELECT e.vec_id, c.cid,
               round(list_sum(list_transform(
                     list_zip(e.embedding::DOUBLE[], c.cvec),
                     z -> (z[1] - z[2]) * (z[1] - z[2]))), 6) AS d2
        FROM embeddings e CROSS JOIN c
      ),
      a AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY d2 ASC, cid ASC) AS rn
              FROM d) WHERE rn = 1),
      v AS (SELECT a.vec_id, a.cid, e.embedding::DOUBLE[] AS vv
            FROM a JOIN embeddings e USING (vec_id)),
      p AS (SELECT y.vec_id, count(*) AS n_dups
            FROM v x JOIN v y ON x.cid = y.cid AND x.vec_id < y.vec_id
            WHERE round(list_inner_product(x.vv, y.vv)
                        / (sqrt(list_inner_product(x.vv, x.vv))
                           * sqrt(list_inner_product(y.vv, y.vv))), 6)
                  >= 0.42
            GROUP BY y.vec_id)
      SELECT a.vec_id, a.cid, coalesce(p.n_dups, 0) AS n_dups,
             CAST(CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER)
               AS keep
      FROM a LEFT JOIN p USING (vec_id)
      ORDER BY vec_id
    """))

  /** Hard-negative mining (contrastive training's other half, the
    * DPR/E5 recipe): for each of the 20 anchor vectors, the single
    * MOST-similar corpus vector with a DIFFERENT label — semantically
    * close but known-wrong, the negatives that actually move a
    * contrastive loss. The anchor set broadcasts (bounded by
    * construction — mining batches, not the corpus); the corpus streams
    * once through the codegen'd CosineSim; the per-anchor argmax is a
    * map-side-combinable `max(struct(cos, −id))` — same shape as
    * q_batch_ann, plus the label-disagreement predicate. Cosines
    * rounded to 6 before the argmax so selection and the compared score
    * are engine-portable. */
  val hardNegatives = QuerySpec(
    "q_hard_negatives",
    (s, d) => {
      val e = embeddings(s, d)
      val anchors = e.filter(col("vec_id") < 20).select(
        col("vec_id").as("anchor_id"), col("label").as("a_label"),
        Similarity.asDouble(col("embedding")).as("a_vec"))
      val corpus = e.select(
        col("vec_id").as("neg_id"), col("label").as("n_label"),
        Similarity.asDouble(col("embedding")).as("n_vec"))
      corpus.crossJoin(broadcast(anchors))
        .filter(col("n_label") =!= col("a_label"))
        .withColumn("cos", round(
          graft.functions.CosineSim.cosine_sim(col("a_vec"), col("n_vec")), 6))
        .groupBy("anchor_id")
        .agg(max(struct(col("cos"), (lit(0L) - col("neg_id")).as("nid")))
          .as("__m"))
        .select(col("anchor_id"), (lit(0L) - col("__m.nid")).as("neg_id"),
          col("__m.cos").as("cos"))
        .orderBy("anchor_id")
    },
    Some("""
      SELECT anchor_id, neg_id, cos FROM (
        SELECT a.vec_id AS anchor_id, n.vec_id AS neg_id,
               round(list_inner_product(a.embedding::DOUBLE[],
                                        n.embedding::DOUBLE[])
                     / (sqrt(list_inner_product(a.embedding::DOUBLE[],
                                                a.embedding::DOUBLE[]))
                        * sqrt(list_inner_product(n.embedding::DOUBLE[],
                                                  n.embedding::DOUBLE[]))), 6)
                 AS cos,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY round(
                                    list_inner_product(a.embedding::DOUBLE[],
                                                       n.embedding::DOUBLE[])
                                    / (sqrt(list_inner_product(a.embedding::DOUBLE[],
                                                               a.embedding::DOUBLE[]))
                                       * sqrt(list_inner_product(n.embedding::DOUBLE[],
                                                                 n.embedding::DOUBLE[]))), 6)
                                    DESC, n.vec_id ASC) AS rn
        FROM embeddings a JOIN embeddings n
          ON a.label <> n.label
        WHERE a.vec_id < 20
      ) AS t WHERE rn = 1
      ORDER BY anchor_id
    """))

  /** Embedding-space drift between two corpus halves (labels 0–4 vs
    * 5–9): centroid cosine and centroid L2 — the semantic companion to
    * the scalar drift family (q_psi / q_js_divergence / q_hellinger).
    * Per-dimension sums accumulate in DECIMAL(38,18) (float→double
    * widening is exact, decimal sums are order-free); the 64 per-dim
    * centroid products quantize ONCE to nano-units so the cross-dim
    * reductions are exact integers; cosine and L2 are one double tree
    * each. Scale shape: one explode + one 2·d-cell aggregate — the
    * centroid never leaves the plan. */
  val embeddingDrift = QuerySpec(
    "q_embedding_drift",
    (s, d) => {
      val parts = embeddings(s, d)
        .select((col("label") >= 5).cast("int").as("g"),
          posexplode(Similarity.asDouble(col("embedding")))
            .as(Seq("dim", "v")))
      val perDim = parts.groupBy("dim").agg(
        sum(when(col("g") === 0, col("v").cast("decimal(38,18)")))
          .cast("double").as("s0"),
        sum(when(col("g") === 1, col("v").cast("decimal(38,18)")))
          .cast("double").as("s1"),
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"))
      val terms = perDim.select(col("n0"), col("n1"),
        expr("CAST(round((s0 / n0) * (s1 / n1) * 1e9) AS BIGINT)").as("dt"),
        expr("CAST(round((s0 / n0) * (s0 / n0) * 1e9) AS BIGINT)").as("at"),
        expr("CAST(round((s1 / n1) * (s1 / n1) * 1e9) AS BIGINT)").as("bt"),
        expr("""CAST(round((s0 / n0 - s1 / n1) * (s0 / n0 - s1 / n1) * 1e9)
              AS BIGINT)""").as("lt"))
      terms.agg(max("n0").as("n0"), max("n1").as("n1"),
          sum("dt").as("dot"), sum("at").as("aa"), sum("bt").as("bb"),
          sum("lt").as("ll"))
        .select(col("n0"), col("n1"),
          round(col("dot").cast("double") /
            (sqrt(col("aa").cast("double")) * sqrt(col("bb").cast("double"))), 6)
            .as("centroid_cosine"),
          round(sqrt(col("ll").cast("double") / 1e9), 6).as("centroid_l2"))
    },
    Some("""
      WITH parts AS (
        SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS g,
               unnest(range(len(embedding))) AS dim,
               unnest(embedding::DOUBLE[]) AS v
        FROM embeddings
      ),
      per_dim AS (
        SELECT dim,
               CAST(sum(CASE WHEN g = 0 THEN CAST(v AS DECIMAL(38,18)) END)
                 AS DOUBLE) AS s0,
               CAST(sum(CASE WHEN g = 1 THEN CAST(v AS DECIMAL(38,18)) END)
                 AS DOUBLE) AS s1,
               CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM parts GROUP BY dim
      ),
      terms AS (
        SELECT n0, n1,
               CAST(round((s0 / n0) * (s1 / n1) * 1e9) AS BIGINT) AS dt,
               CAST(round((s0 / n0) * (s0 / n0) * 1e9) AS BIGINT) AS at,
               CAST(round((s1 / n1) * (s1 / n1) * 1e9) AS BIGINT) AS bt,
               CAST(round((s0 / n0 - s1 / n1) * (s0 / n0 - s1 / n1) * 1e9)
                 AS BIGINT) AS lt
        FROM per_dim
      )
      SELECT max(n0) AS n0, max(n1) AS n1,
             round(CAST(sum(dt) AS DOUBLE)
                   / (sqrt(CAST(sum(at) AS DOUBLE))
                      * sqrt(CAST(sum(bt) AS DOUBLE))), 6)
               AS centroid_cosine,
             round(sqrt(CAST(sum(lt) AS DOUBLE) / 1e9), 6) AS centroid_l2
      FROM terms
    """))

  val all: Seq[QuerySpec] = Seq(
    similarityTopk, similarityAnn, similarityLsh, dedupEmbed, batchAnn,
    similarityPq, semDedup, ivfPq, annPersist, annAppend, annCompact,
    hardNegatives, embeddingDrift)
}
