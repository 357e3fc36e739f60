package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.Text

/** Training-data pipeline operators beyond dedup/similarity (SURVEY §2b):
  * the dataset-assembly steps a 100 TB pretraining corpus needs between
  * "filtered documents" and "token batches" — deterministic splits,
  * chunking, sequence packing, per-source caps, epoch shuffling.
  *
  * Everything here is a pure column-expression plan (no UDFs, no driver
  * loops) and every query is value-oracled in DuckDB: the only shared
  * primitive the two engines need is md5 over strings, which both produce
  * identically (lowercase hex).
  */
object PipelineQueries {

  /** Deterministic hash split (train/valid/test ≈ 80/10/10): bucket by the
    * first two hex chars of md5("split42:" + doc_id) — 256 buckets,
    * compared lexicographically ('cc' = 204 ⇒ 79.7% train, 'e6' = 230 ⇒
    * 10.2% valid, rest test).
    *
    * This, not seeded randomSplit, is the production split: assignment is
    * a pure function of the example key, so it is stable across reruns,
    * engines, repartitions, and incremental arrivals — new data lands in
    * the same split forever, and leakage checks can recompute membership.
    * Scale: embarrassingly parallel map + one aggregate, no shuffle beyond
    * the final 3-row agg. */
  val hashSplit = QuerySpec(
    "q_hash_split",
    (s, d) => {
      documents(s, d)
        .withColumn("split", graft.ops.Router.hashSplit(col("doc_id")))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("split")
    },
    Some("""
      SELECT split, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(sum(doc_id) AS BIGINT) AS id_sum
      FROM (
        SELECT *, CASE WHEN substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                         THEN 'train'
                       WHEN substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                         THEN 'valid'
                       ELSE 'test' END AS split
        FROM documents
      )
      GROUP BY split
      ORDER BY split
    """))

  /** Overlapping fixed-window chunking (512 chars, stride 448 ⇒ 64-char
    * overlap) — the context-window prep step for embedding / retrieval
    * corpora. One generate-positions + substring pass per doc; chunks
    * identified by content digest so the compare pins the bytes without
    * shipping them. Scale: explode fan-out is bounded by len/stride per
    * row, no shuffle at all until a downstream consumer groups. */
  val chunkDocs = QuerySpec(
    "q_chunk_docs",
    (s, d) => {
      val chunk = col("text").substr(col("start"), lit(512))
      documents(s, d)
        .select(
          col("doc_id"), col("text"),
          posexplode(sequence(lit(1), greatest(length(col("text")), lit(1)),
            lit(448))).as(Seq("chunk_idx", "start")))
        .select(
          col("doc_id"), col("chunk_idx"),
          // long, matching DuckDB len() BIGINT (strict-hash width)
          length(chunk).cast("long").as("chunk_chars"),
          md5(chunk).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some("""
      SELECT doc_id,
             CAST((start - 1) // 448 AS INTEGER) AS chunk_idx,
             length(substr(text, CAST(start AS INTEGER), 512)) AS chunk_chars,
             md5(substr(text, CAST(start AS INTEGER), 512)) AS chunk_md5
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, greatest(len(text), 1), 448)) AS start
            FROM documents)
      ORDER BY doc_id, chunk_idx
    """))

  /** Sequence packing by concat-and-split: documents stream per lang in
    * doc_id order into a 4096-token context budget; a doc's bin is its
    * starting offset in the concatenated token stream DIV 4096 — the
    * standard "concatenate then cut at context boundaries" pretraining
    * packing (docs may straddle bins; the bin is where they start).
    * One window cumsum + one aggregate, both on the lang partition key. */
  val packSequences = QuerySpec(
    "q_pack_sequences",
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      documents(s, d)
        .withColumn("n_tok", size(Text.tokens(col("text"))).cast("long"))
        .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
        .withColumn("bin", (col("start_off") / 4096L).cast("long"))
        .groupBy("lang", "bin")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("bin_tokens"))
        .orderBy("lang", "bin")
    },
    Some("""
      SELECT lang, CAST(start_off // 4096 AS BIGINT) AS bin,
             count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS bin_tokens
      FROM (
        SELECT lang, doc_id, n_tok,
               sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tok AS start_off
        FROM (SELECT lang, doc_id,
                     CAST(len(list_filter(string_split_regex(lower(text), '\W+'),
                                          t -> t <> '')) AS BIGINT) AS n_tok
              FROM documents)
      )
      GROUP BY lang, bin
      ORDER BY lang, bin
    """))

  /** Per-source cap (50 docs per source, lowest doc_id wins) — the
    * "no domain dominates the mix" sampler every crawl pipeline runs.
    * One window rank per source partition; survivors keep their rows.
    * Scale: hash shuffle on source; a skewed mega-source is exactly the
    * case the cap bounds (its partition emits ≤ cap rows). */
  val domainCap = QuerySpec(
    "q_domain_cap",
    (s, d) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
      documents(s, d)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 50)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, source, lang
      FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM documents)
      WHERE rn <= 50
      ORDER BY doc_id
    """))

  /** Deterministic epoch shuffle: global example order for epoch 42 is
    * "sort by md5(epoch:doc_id)" — reproducible on any engine, no RNG
    * state to ship. The query emits the first 2000 examples of the epoch
    * (a batch-sampler page) as a TakeOrdered — no global sort
    * materializes. At 100 TB the full epoch order is a range-partitioned
    * sort by the same key (sortWithinPartitions after repartitionByRange);
    * a dense global rank is never needed. */
  val globalShuffle = QuerySpec(
    "q_global_shuffle",
    (s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          md5(concat(lit("epoch42:"), col("doc_id").cast("string")))
            .as("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
        .limit(2000),
    Some("""
      SELECT doc_id, md5('epoch42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
      ORDER BY shuffle_key, doc_id
      LIMIT 2000
    """))

  /** Max-sequence-length truncation: keep each doc's first 256 tokens,
    * pin the truncated text by digest. The everyday "fit the context
    * window" op; slice+join stays a pure column expression (the codegen'd
    * tokenizer feeds a bounded array slice — no per-token shuffle). */
  val truncateTokens = QuerySpec(
    "q_truncate_tokens",
    (s, d) => {
      val toks = Text.tokens(col("text"))
      documents(s, d)
        .select(
          col("doc_id"),
          size(toks).as("n_tok"),
          least(size(toks), lit(256)).as("n_tok_kept"),
          md5(array_join(slice(toks, 1, 256), " ")).as("trunc_md5"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_tok,
             CAST(least(len(toks), 256) AS INTEGER) AS n_tok_kept,
             -- Spark's array_join([]) is '', DuckDB's array_to_string([])
             -- is NULL: an EMPTY doc's truncation digest is md5(''), a
             -- NULL doc's is NULL (hollow DegenGate contract)
             md5(CASE WHEN toks IS NULL THEN NULL
                 ELSE coalesce(array_to_string(toks[1:256], ' '), '')
                 END) AS trunc_md5
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\W+'),
                               t -> t <> '') AS toks
            FROM documents)
      ORDER BY doc_id
    """))

  /** Temperature-scaled mixture weights (α = 0.5, "sqrt sampling"): the
    * multilingual-training reweighting that upsamples low-resource
    * languages. Per-lang exact token totals; share is an exact-integer
    * ratio and w_sqrt a single correctly-rounded sqrt — no float SUMS
    * cross rows, so both engines agree bit-for-bit. The normalization
    * constant (a sum of irrationals) is deliberately left to the trainer:
    * it is reduction-order-dependent and belongs driver-side at batch
    * assembly, not in the compared relational output. */
  val mixtureWeights = QuerySpec(
    "q_mixture_weights",
    (s, d) => {
      val perLang = documents(s, d)
        .withColumn("n_tok", size(Text.tokens(col("text"))).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("lang_tokens"))
      val total = perLang.agg(sum("lang_tokens").as("total_tokens"))
      perLang.crossJoin(total)
        .select(
          col("lang"), col("n_docs"), col("lang_tokens"),
          try_divide(col("lang_tokens").cast("double"),
            col("total_tokens"))
            .as("share"),
          sqrt(try_divide(col("lang_tokens").cast("double"),
            col("total_tokens")))
            .as("w_sqrt"))
        .orderBy("lang")
    },
    Some("""
      WITH per_lang AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(list_filter(string_split_regex(lower(text), '\W+'),
                                        t -> t <> ''))) AS BIGINT) AS lang_tokens
        FROM documents
        GROUP BY lang
      )
      SELECT lang, n_docs, lang_tokens,
             CAST(lang_tokens AS DOUBLE) / total_tokens AS share,
             sqrt(CAST(lang_tokens AS DOUBLE) / total_tokens) AS w_sqrt
      FROM per_lang,
           (SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens FROM per_lang)
      ORDER BY lang
    """))

  /** Distribution drift between two source cohorts (src0–9 vs src10–19):
    * doc-length histogram (10 fixed 200-char buckets, capped) with per-
    * cohort rates and a per-bucket drift flag |rate_a − rate_b| > 0.02 —
    * the dataset-monitoring check a refreshed crawl runs against the
    * previous snapshot before training on it. Counts are exact integers;
    * each rate is ONE IEEE division of exact ints, and the flag compares
    * two such doubles — every cell engine-portable.
    *
    * Scale shape: one pass, map-side-combinable (bucket, cohort) counts;
    * the totals it normalizes by ride the same 10-row aggregate. */
  val sourceDrift = QuerySpec(
    "q_source_drift",
    (s, d) => {
      val agg = documents(s, d)
        .select(
          least(floor(col("n_chars") / lit(200)), lit(9)).cast("int")
            .as("bucket"),
          // nullif: an EMPTY source string (degen hollow) has no cohort
          // number — NULL, where a bare ANSI cast of '' errors
          (nullif(substring(col("source"), 4, 8), lit(""))
            .cast("int") < 10).as("is_a"))
        .groupBy("bucket")
        .agg(
          sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"),
          // when(is_a, 0).otherwise(1), NOT when(!is_a, 1).otherwise(0):
          // a NULL cohort number (degen hollow) must fall to B exactly
          // like the oracle's CASE ELSE branch
          sum(when(col("is_a"), 0L).otherwise(1L)).as("cnt_b"))
      val tot = agg.agg(sum("cnt_a").as("tot_a"), sum("cnt_b").as("tot_b"))
      agg.crossJoin(tot)
        .select(
          col("bucket"), col("cnt_a"), col("cnt_b"),
          // try_divide: a corpus with only one source cohort (degenerate
          // corpora) has a NULL comparison rate, not an ANSI error
          try_divide(col("cnt_a").cast("double"),
            col("tot_a").cast("double")).as("rate_a"),
          try_divide(col("cnt_b").cast("double"),
            col("tot_b").cast("double")).as("rate_b"),
          (abs(try_divide(col("cnt_a").cast("double"),
            col("tot_a").cast("double")) -
            try_divide(col("cnt_b").cast("double"),
              col("tot_b").cast("double"))) > 0.02)
            .cast("int").as("drifted"))
        .orderBy("bucket")
    },
    Some("""
      WITH agg AS (
        SELECT CAST(least(floor(n_chars / 200), 9) AS INTEGER) AS bucket,
               CAST(sum(CASE WHEN CAST(nullif(substr(source, 4), '')
                                       AS INTEGER) < 10
                             THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
               CAST(sum(CASE WHEN CAST(nullif(substr(source, 4), '')
                                       AS INTEGER) < 10
                             THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
        FROM documents
        GROUP BY 1
      ),
      tot AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
                     CAST(sum(cnt_b) AS BIGINT) AS tot_b FROM agg)
      SELECT bucket, cnt_a, cnt_b,
             CAST(cnt_a AS DOUBLE) / CAST(tot_a AS DOUBLE) AS rate_a,
             CAST(cnt_b AS DOUBLE) / CAST(tot_b AS DOUBLE) AS rate_b,
             CAST(abs(CAST(cnt_a AS DOUBLE) / CAST(tot_a AS DOUBLE)
                      - CAST(cnt_b AS DOUBLE) / CAST(tot_b AS DOUBLE)) > 0.02
                  AS INTEGER) AS drifted
      FROM agg, tot
      ORDER BY bucket
    """))

  /** Export-shard manifest — the pipeline's LAST step: deduped survivors
    * assigned to 8 shards by content-hash (stable under reruns, engines,
    * and arrival order, like q_hash_split), with the per-shard manifest a
    * real export writes next to the data: doc count, exact token total,
    * and a shard FINGERPRINT (md5 over the shard's sorted content
    * digests) that downstream consumers can recompute to prove shard
    * integrity. Sorting the digests before hashing is what makes the
    * fingerprint layout-independent — collect order is not deterministic,
    * the sorted digest string is.
    *
    * Scale shape: digest + shard id are pure per-row expressions; the
    * manifest is one map-side-combinable aggregate per shard (collect_list
    * is bounded by the shard's doc count — at 100 TB the fingerprint
    * would roll up per sub-shard file first, same sorted-digest rule). */
  val exportShards = QuerySpec(
    "q_export_shards",
    (s, d) => {
      val base = graft.ops.Dedup.exact(documents(s, d), col("text"),
          col("doc_id"))
        .withColumn("digest", md5(col("text")))
        .withColumn("shard_id",
          pmod(expr("instr('0123456789abcdef', substr(digest, 1, 1))") - 1,
            lit(8)).cast("int"))
        .withColumn("n_tok", size(Text.tokens(col("text"))).cast("long"))
      base.groupBy("shard_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          md5(concat_ws(",", array_sort(collect_list(col("digest")))))
            .as("fingerprint"))
        .orderBy("shard_id")
    },
    Some("""
      WITH survivors AS (
        -- coalesce arm = Dedup.exact's NULL contract (NULL content is
        -- missing, not duplicate; ops/Dedup.scala:26)
        SELECT doc_id, text FROM (
          SELECT doc_id, text,
                 row_number() OVER (
                   PARTITION BY coalesce(md5(lower(trim(text))),
                                         '__null__' || CAST(doc_id AS VARCHAR))
                   ORDER BY doc_id) AS rn
          FROM documents
        ) WHERE rn = 1
      ),
      sharded AS (
        SELECT (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) % 8
                 AS shard_id,
               md5(text) AS digest,
               len(list_filter(string_split_regex(lower(text), '\W+'),
                               t -> t <> '')) AS n_tok
        FROM survivors
      )
      SELECT CAST(shard_id AS INTEGER) AS shard_id,
             count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             -- Spark's collect_list SKIPS NULL digests, so a shard of
             -- all-NULL docs fingerprints as md5('') — string_agg over
             -- zero values is NULL, hence the coalesce (hollow DegenGate)
             md5(coalesce(string_agg(digest, ',' ORDER BY digest), ''))
               AS fingerprint
      FROM sharded
      GROUP BY 1
      ORDER BY 1
    """))

  /** End-to-end RAG index build as ONE lazy DAG: chunk (q_chunk_docs's
    * 512/448 shape) → deterministic hash-embedding (8 dims of 0..255
    * from the chunk md5's hex-digit pairs — the portable stand-in for a
    * real encoder; coordinates are exact ints, so squared distances stay
    * exact in double) → nearest-centroid assignment (reuses
    * Similarity.kmeansAssign: 4 lowest-uid seeds, broadcast centroids,
    * min-struct argmin) → per-cluster manifest with a recomputable
    * membership fingerprint (numeric-sorted uids, q_export_shards'
    * convention). The oracle replays every stage, so the COMPOSITION is
    * verified, not just the pieces — prep_pipeline's pattern applied to
    * the retrieval-index path. */
  val ragIndex = QuerySpec(
    "q_rag_index",
    (s, d) => {
      val chunkText = col("text").substr(col("start"), lit(512))
      def digit(i: Int) =
        (expr(s"instr('0123456789abcdef', substr(h, $i, 1))") - 1)
      // uid stride 1e6: collision-free up to million-chunk (~448 MB)
      // documents — 1000 would alias doc N chunk 1000 with doc N+1
      // chunk 0 at ~448 KB, well inside real-corpus sizes
      // chunker contract: a NULL document has nothing to chunk — zero
      // chunks, not a NULL-embedding chunk the assignment would refuse
      // (hollow DegenGate; the oracle carries the same predicate)
      val chunks = fanOut(s, documents(s, d))
        .filter(col("text").isNotNull)
        .select(
          col("doc_id"),
          posexplode(sequence(lit(1), greatest(length(col("text")), lit(1)),
            lit(448))).as(Seq("chunk_idx", "start")),
          col("text"))
        .select(
          (col("doc_id") * 1000000L + col("chunk_idx")).as("chunk_uid"),
          length(chunkText).as("n_chars"),
          md5(chunkText).as("h"))
        .select(
          col("chunk_uid"), col("n_chars"),
          array((0 until 8).map(j =>
            (digit(2 * j + 1) * 16 + digit(2 * j + 2)).cast("double")): _*)
            .as("v"))
        // materialize-once barrier (the shingledDocs convention): the
        // centroid seed scan, the assignment scan, and the n_chars
        // join-back all read this frame — uncached, the document scan +
        // substring explode + per-chunk md5 would run three times
        .cache()
      val assigned = graft.ops.Similarity
        .kmeansAssign(chunks, "chunk_uid", "v", k = 4)
      assigned.join(chunks.select("chunk_uid", "n_chars"), "chunk_uid")
        .groupBy("cid")
        .agg(
          count(lit(1)).as("n_chunks"),
          sum(col("n_chars")).as("total_chars"),
          md5(array_join(
            transform(array_sort(collect_list(col("chunk_uid"))),
              x => x.cast("string")), ",")).as("member_md5"))
        .orderBy("cid")
    },
    Some("""
      WITH chunks AS (
        SELECT doc_id * 1000000 + CAST((start - 1) // 448 AS BIGINT) AS chunk_uid,
               length(substr(text, CAST(start AS INTEGER), 512)) AS n_chars,
               md5(substr(text, CAST(start AS INTEGER), 512)) AS h
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, greatest(len(text), 1), 448))
                       AS start
              FROM documents
              WHERE text IS NOT NULL)
      ),
      emb AS (
        SELECT chunk_uid, n_chars,
               list_transform(range(0, 8), j ->
                 CAST((strpos('0123456789abcdef', substr(h, CAST(2*j+1 AS INTEGER), 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substr(h, CAST(2*j+2 AS INTEGER), 1)) - 1)
                    AS DOUBLE)) AS v
        FROM chunks
      ),
      c AS (SELECT chunk_uid AS cid, v AS cvec FROM emb
            ORDER BY chunk_uid LIMIT 4),
      d AS (
        SELECT e.chunk_uid, e.n_chars, c.cid,
               round(list_sum(list_transform(list_zip(e.v, c.cvec),
                     z -> (z[1] - z[2]) * (z[1] - z[2]))), 6) AS d2
        FROM emb e CROSS JOIN c
      ),
      a AS (SELECT chunk_uid, n_chars, cid,
                   row_number() OVER (PARTITION BY chunk_uid
                                      ORDER BY d2 ASC, cid ASC) AS rn
            FROM d)
      SELECT cid,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             md5(array_to_string(list_sort(list(chunk_uid)), ',')) AS member_md5
      FROM a WHERE rn = 1
      GROUP BY cid
      ORDER BY cid
    """))

  /** Shared DuckDB CTE chain for the DSIR per-doc weights — ONE
    * definition, so [[importanceWeight]] and [[essAudit]] can never
    * drift on what "the weight" is. Final CTE `dsir`: (doc_id, n_tok,
    * weight) with the 1e-9 round already applied (weight 0.0 for
    * token-less docs). */
  private val DsirWeightSql = """occ AS (
        SELECT doc_id, source,
               CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                    + strpos('0123456789abcdef', substr(h, 2, 1)) - 1
                    AS INTEGER) AS b
        FROM (
          SELECT doc_id, source, md5(t) AS h
          FROM (SELECT doc_id, source,
                       unnest(list_filter(string_split_regex(lower(text), '\W+'),
                                          x -> x <> '')) AS t
                FROM documents)
        )
      ),
      buckets AS (
        SELECT b, CAST(count(*) AS BIGINT) AS c_cnt,
               CAST(coalesce(sum(CASE WHEN source IN ('src0','src1','src2')
                                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS t_cnt
        FROM occ GROUP BY b
      ),
      totals AS (
        SELECT CAST(count(*) AS BIGINT) AS c_tot,
               CAST(coalesce(sum(CASE WHEN source IN ('src0','src1','src2')
                                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS t_tot
        FROM occ
      ),
      per AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
               sum(CAST(CAST((t_cnt + 1) * (c_tot + 256) AS DOUBLE)
                        / CAST((c_cnt + 1) * (t_tot + 256) AS DOUBLE)
                        AS DECIMAL(38,18))) AS rsum
        FROM occ JOIN buckets USING (b) CROSS JOIN totals
        GROUP BY doc_id
      ),
      dsir AS (
        SELECT d.doc_id, coalesce(n_tok, 0) AS n_tok,
               CASE WHEN n_tok IS NULL THEN 0.0
                    ELSE round(CAST(rsum AS DOUBLE) / CAST(n_tok AS DOUBLE),
                               9)
               END AS weight
        FROM documents d LEFT JOIN per USING (doc_id)
      )"""

  /** Hashed-n-gram importance weights for targeted data selection — the
    * DSIR shape (Xie et al. 2023: score raw docs by how target-like their
    * hashed n-gram distribution is, no classifier, no vocabulary pass).
    * Target distribution comes from a small designated slice (sources
    * src0–src2 stand in for "high-quality domain sample"); both the
    * target and corpus distributions are add-one-smoothed counts over 256
    * md5-derived buckets.
    *
    * Log-free for the bit-exact gate: the paper's Σ log(t/c) becomes the
    * arithmetic MEAN of per-occurrence probability ratios — each ratio is
    * ONE IEEE division of exact integer products (counts ≤ 1e6 × 1e6
    * stays under 2^53), per-doc means go through the tie-free
    * DECIMAL(38,18) sum. Ranks target-like docs the same way; no libm.
    *
    * Scale shape: the bucket table is 256 rows and the totals row is ONE
    * row — both broadcast; the corpus side is an embarrassingly parallel
    * map + one map-side-combinable per-doc aggregate. Zero global state:
    * this is why hashed importance weighting works at 100 TB where a
    * vocabulary-keyed variant would need a giant dictionary. */
  val importanceWeight = QuerySpec(
    "q_importance_weight",
    (s, d) => {
      val isTarget = col("source").isin("src0", "src1", "src2")
      val occ = fanOut(s, documents(s, d))
        .select(col("doc_id"), col("source"),
          explode(Text.tokens(col("text"))).as("t"))
        .withColumn("h", md5(col("t")))
        .withColumn("b",
          ((expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
            (expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1))
            .cast("int"))
        .select("doc_id", "source", "b")
        .cache()
      val buckets = occ.groupBy("b").agg(count(lit(1)).as("c_cnt"))
        .join(occ.filter(isTarget).groupBy("b")
          .agg(count(lit(1)).as("t_cnt")), Seq("b"), "left")
        .select(col("b"), col("c_cnt"),
          coalesce(col("t_cnt"), lit(0L)).as("t_cnt"))
      val totals = occ.agg(count(lit(1)).as("c_tot"),
        sum(when(isTarget, lit(1L)).otherwise(lit(0L))).as("t_tot"))
      val r = ((col("t_cnt") + 1L) * (col("c_tot") + 256L)).cast("double") /
        ((col("c_cnt") + 1L) * (col("t_tot") + 256L)).cast("double")
      val per = occ.join(broadcast(buckets), "b")
        .crossJoin(broadcast(totals))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(r.cast("decimal(38,18)")).as("rsum"))
      documents(s, d).select("doc_id")
        .join(per, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("n_tok"), lit(0L)).as("n_tok"),
          // round(9) absorbs the engines' differing DECIMAL→DOUBLE cast
          // rounding (JVM correctly rounded, DuckDB double-rounds through
          // int128); `keep` derives from the ROUNDED weight so the
          // threshold compare cannot flip on a last-ulp difference
          when(col("n_tok").isNull, lit(0.0))
            .otherwise(round(col("rsum").cast("double")
              / col("n_tok").cast("double"), 9)).as("weight"))
        .withColumn("keep",
          (col("weight") > 1.0).cast("int"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $DsirWeightSql
      SELECT doc_id, n_tok, weight,
             CAST(CASE WHEN weight > 1.0 THEN 1 ELSE 0 END AS INTEGER)
               AS keep
      FROM dsir
      ORDER BY doc_id
    """))

  /** Weighted sample without replacement, derandomized (Router.aresKey
    * scaladoc has the portability argument): top-50 docs by the A-ES
    * key with weight = n_chars — long docs oversampled in proportion.
    * TakeOrdered top-k (PlanSpec-checked elsewhere for the same shape),
    * membership a pure function of the key → incremental-arrival-safe
    * exactly like q_hash_split. */
  val weightedSample = QuerySpec(
    "q_weighted_sample",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          graft.ops.Router.aresKey(col("doc_id"), col("n_chars")).as("__k"))
        .orderBy(col("__k").desc, col("doc_id"))
        .limit(50)
        .select("doc_id", "n_chars")
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id, n_chars FROM (
        SELECT doc_id, n_chars,
               ln( (('0x' || substr(md5('ws42:' || CAST(doc_id AS VARCHAR)),
                                    1, 12))::BIGINT + 1)
                   / 281474976710656.0 ) / n_chars AS k
        FROM documents
        ORDER BY k DESC, doc_id LIMIT 50) AS t
      ORDER BY doc_id
    """))

  /** Uniform negative sampling for contrastive training — k = 4
    * derandomized negatives per anchor: neg = md5-uniform(anchor, j)
    * mod N over the dense id space, +1 shift on self-collision. Pure
    * map — no join, no shuffle, no RNG state: pairs are a function of
    * (anchor, j, N), so epochs are reproducible and incremental reruns
    * emit identical pairs. At 100 TB ids aren't dense — the production
    * form first compacts them with ONE [[graft.ops.Ranks.globalRank]]
    * pass and samples in rank space; the sampling map itself is
    * unchanged. */
  val negativeSample = QuerySpec(
    "q_negative_sample",
    (s, d) => {
      val n = lit(500L) // dense 0..N−1 id space, fixed across SFs
      val h = conv(substring(md5(concat(lit("neg42:"),
          col("doc_id").cast("string"), lit(":"), col("j").cast("string"))),
        1, 12), 16, 10).cast("bigint")
      val raw = pmod(h, n)
      documents(s, d)
        .select(col("doc_id"),
          explode(sequence(lit(1L), lit(4L))).as("j")) // long: oracle generate_series is BIGINT
        .withColumn("neg_id",
          when(raw === col("doc_id"), pmod(raw + 1, n)).otherwise(raw))
        .select("doc_id", "j", "neg_id")
        .orderBy("doc_id", "j")
    },
    Some("""
      SELECT doc_id, j,
             CASE WHEN raw = doc_id THEN (raw + 1) % 500 ELSE raw END
               AS neg_id
      FROM (
        SELECT doc_id, j,
               ('0x' || substr(md5('neg42:' || CAST(doc_id AS VARCHAR) || ':'
                                   || CAST(j AS VARCHAR)), 1, 12))::BIGINT
                 % 500 AS raw
        FROM documents, (SELECT unnest(generate_series(1, 4)) AS j) AS js
      ) AS t
      ORDER BY doc_id, j
    """))

  /** The last mile of the assembly pipeline: text → integer TOKEN-ID
    * sequences against the built vocabulary (q_vocab_build's exact
    * ranking — top-200 by count desc, token asc), unknown tokens → id 0.
    * Per doc: token/UNK counts plus the md5 of the comma-joined id
    * sequence in position order — the q_truncate_tokens fingerprint
    * discipline, so the full sequence is hash-gated without an array
    * column in the compared output.
    *
    * Scale shape: the vocab is BROADCAST (bounded by vocabulary size by
    * construction); tokenize + posexplode are map-side; the only
    * corpus shuffle is the per-doc reassembly groupBy, whose state is
    * bounded by one document's tokens. The vocab-candidate ranking is
    * [[graft.ops.Ranks.globalRank]] over the descCountKey embedding
    * (r12: the candidate table grows with the corpus vocabulary, so the
    * former unpartitioned rank window was a single-task funnel; ranks
    * are order-only, values identical). Empty-token docs keep a row
    * (md5 of the empty string) via the left join from the full document
    * list. */
  val tokenizeIds = QuerySpec(
    "q_tokenize_ids",
    (s, d) => {
      val counts = graft.ops.Checkpoints.materialize(
        fanOut(s, documents(s, d))
          .select(explode(Text.tokens(col("text"))).as("t"))
          .groupBy("t").agg(count(lit(1)).as("cnt")))
      val keyed = counts.withColumn("__vk",
        graft.ops.Ranks.descCountKey(col("cnt"), col("t")))
      val nParts = s.sessionState.conf.numShufflePartitions
      val vocab = graft.ops.Ranks
        .globalRank(keyed, Seq(col("__vk")), nParts, "__rk")
        .withColumn("tok_id", col("__rk").cast("int")) // row_number()'s INT
        .filter(col("tok_id") <= 200)
        .select("t", "tok_id")
      val ids = fanOut(s, documents(s, d))
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
        .withColumnRenamed("col", "t")
        .join(broadcast(vocab), Seq("t"), "left")
        .withColumn("id", coalesce(col("tok_id"), lit(0)))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("tok_id").isNull, 1L).otherwise(0L)).as("n_unk"),
          md5(concat_ws(",",
            transform(array_sort(collect_list(struct(col("pos"), col("id")))),
              x => x.getField("id").cast("string")))).as("ids_md5"))
      documents(s, d).select("doc_id")
        .join(ids, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_unk"), lit(0L)).as("n_unk"),
          coalesce(col("ids_md5"), md5(lit(""))).as("ids_md5"))
        .orderBy("doc_id")
    },
    Some("""
      WITH counts AS (
        SELECT t, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'),
                                        x -> x <> '')) AS t
              FROM documents)
        GROUP BY t
      ),
      vocab AS (
        SELECT t, tok_id FROM (
          SELECT t, row_number() OVER (ORDER BY cnt DESC, t ASC) AS tok_id
          FROM counts
        ) WHERE tok_id <= 200
      ),
      tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\W+'),
                           x -> x <> '') AS toks
        FROM documents
      ),
      pe AS (
        SELECT doc_id, unnest(toks) AS t,
               unnest(range(1, len(toks) + 1)) AS pos
        FROM tok WHERE len(toks) > 0
      ),
      ids AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN tok_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unk,
               md5(string_agg(CAST(coalesce(tok_id, 0) AS VARCHAR), ','
                              ORDER BY pos)) AS ids_md5
        FROM pe LEFT JOIN vocab USING (t)
        GROUP BY doc_id
      )
      SELECT d.doc_id,
             coalesce(n_tokens, 0) AS n_tokens,
             coalesce(n_unk, 0) AS n_unk,
             coalesce(ids_md5, md5('')) AS ids_md5
      FROM documents d LEFT JOIN ids USING (doc_id)
      ORDER BY d.doc_id
    """))

  /** Temporal train/valid/test split with an in-plan LEAKAGE AUDIT —
    * the split a time-series model must use where q_hash_split's random
    * assignment would leak the future into training: rows partition by
    * fixed date cutoffs (train < 1996, valid 1996, test ≥ 1997), and
    * the audit columns prove the span ordering holds (every split's max
    * day strictly below the next split's min day) as data, not as a
    * comment. One pass, one aggregate; days are epoch ints so the
    * compare is type-stable. */
  val timeSplit = QuerySpec(
    "q_time_split",
    (s, d) => {
      val day = datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date"))
      val split = when(year(col("o_orderdate")) < 1996, "train")
        .when(year(col("o_orderdate")) === 1996, "valid")
        .otherwise("test")
      val per = orders(s, d)
        .select(split.as("split"), day.as("day"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_rows"),
          min("day").as("min_day"), max("day").as("max_day"))
      val audit = per.agg(
        max(when(col("split") === "train", col("max_day"))).as("tr_max"),
        min(when(col("split") === "valid", col("min_day"))).as("va_min"),
        max(when(col("split") === "valid", col("max_day"))).as("va_max"),
        min(when(col("split") === "test", col("min_day"))).as("te_min"))
        .select(
          // when/otherwise: a corpus missing a whole split (degen single)
          // has NULL span bounds, and the oracle's CASE reads that as 0
          when(col("tr_max") < col("va_min") &&
            col("va_max") < col("te_min"), 1).otherwise(0)
            .cast("int").as("no_leakage"))
      per.crossJoin(broadcast(audit)).orderBy("split")
    },
    Some("""
      WITH per AS (
        SELECT CASE WHEN year(CAST(o_orderdate AS DATE)) < 1996 THEN 'train'
                    WHEN year(CAST(o_orderdate AS DATE)) = 1996 THEN 'valid'
                    ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                    AS INTEGER) AS min_day,
               CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                    AS INTEGER) AS max_day
        FROM orders
        GROUP BY 1
      ),
      audit AS (
        SELECT CAST(CASE WHEN
                 max(CASE WHEN split = 'train' THEN max_day END)
                   < min(CASE WHEN split = 'valid' THEN min_day END)
                 AND max(CASE WHEN split = 'valid' THEN max_day END)
                   < min(CASE WHEN split = 'test' THEN min_day END)
               THEN 1 ELSE 0 END AS INTEGER) AS no_leakage
        FROM per
      )
      SELECT split, n_rows, min_day, max_day, no_leakage
      FROM per CROSS JOIN audit
      ORDER BY split
    """))

  /** Consistent-hash ring assignment (Karger et al. 1997) with virtual
    * nodes — the shard-rebalancing layout [[hashSplit]]'s modulo can't
    * give: mod N reassigns ~(N−1)/N of all keys when N changes; the
    * ring moves only the departed node's arc. 4 nodes × 8 vnodes
    * hash onto the md5 ring (hex strings — the one hash both engines
    * spell identically; lexicographic order IS the ring order); a doc
    * lands on the first vnode clockwise from its own hash (min vnode
    * hash ≥ doc hash, wrapping to the global min). The query assigns
    * every doc on the full ring AND on the ring with node 'n3'
    * removed, reporting per-node counts and the MEASURED moved
    * fraction — which must equal n3's share exactly, the property the
    * algorithm exists for (asserted as an in-plan verdict: every
    * moved doc was on n3). The 32-row vnode frame broadcasts; the
    * corpus-side work is two broadcast-join min-aggregates — nothing
    * global, nothing iterative. */
  val hashRing = QuerySpec(
    "q_hash_ring",
    (s, d) => {
      import s.implicits._
      val nodes = Seq("n0", "n1", "n2", "n3")
      val vn = nodes.flatMap(n => (0 until 8).map(v => (n, s"$n#v$v")))
        .toDF("node", "vkey")
        .select(col("node"), md5(col("vkey")).as("vh"))
        .cache()
      def assign(ring: org.apache.spark.sql.DataFrame, as: String) = {
        val ringMin = ring.orderBy("vh").limit(1)
          .select(col("node").as("wrap_node"))
        val docs = documents(s, d)
          .select(col("doc_id"), md5(col("doc_id").cast("string")).as("dh"))
        docs.join(broadcast(ring), col("vh") >= col("dh"), "left")
          .groupBy("doc_id", "dh")
          .agg(min(struct(col("vh"), col("node"))).as("first"))
          .crossJoin(broadcast(ringMin))
          .select(col("doc_id"),
            coalesce(col("first.node"), col("wrap_node")).as(as))
      }
      val full = assign(vn, "node_full")
      val reduced = assign(vn.filter(col("node") =!= "n3"), "node_reduced")
      // one row per doc (corpus-proportional), read by both the per-node
      // and total aggregates: localCheckpoint, not a leaked cache
      val joined = full.join(reduced, "doc_id").localCheckpoint()
      val perNode = joined.groupBy(col("node_full").as("node"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("node_full") =!= col("node_reduced")).cast("long"))
            .as("n_moved"))
      val tot = joined.agg(
        count(lit(1)).as("n_total"),
        sum((col("node_full") =!= col("node_reduced")).cast("long"))
          .as("moved_total"),
        min((col("node_full") === "n3" ||
          col("node_full") === col("node_reduced")).cast("int"))
          .as("only_n3_moved"))
      perNode.crossJoin(broadcast(tot))
        .select(col("node"), col("n_docs"), col("n_moved"),
          (col("moved_total").cast("double") / col("n_total").cast("double"))
            .as("moved_frac"),
          col("only_n3_moved"))
        .orderBy("node")
    },
    Some("""
      WITH nodes AS (SELECT unnest(['n0', 'n1', 'n2', 'n3']) AS node),
      vn AS (
        SELECT node, md5(node || '#v' || CAST(v AS VARCHAR)) AS vh
        FROM nodes CROSS JOIN (SELECT unnest(range(0, 8)) AS v)
      ),
      docs AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS dh FROM documents
      ),
      full_assign AS (
        SELECT d.doc_id,
               coalesce(min(CASE WHEN v.vh >= d.dh THEN v.vh END),
                        (SELECT min(vh) FROM vn)) AS pick
        FROM docs d CROSS JOIN vn v
        GROUP BY d.doc_id, d.dh
      ),
      full_named AS (
        SELECT f.doc_id, v.node AS node_full
        FROM full_assign f JOIN vn v ON v.vh = f.pick
      ),
      vn2 AS (SELECT * FROM vn WHERE node <> 'n3'),
      red_assign AS (
        SELECT d.doc_id,
               coalesce(min(CASE WHEN v.vh >= d.dh THEN v.vh END),
                        (SELECT min(vh) FROM vn2)) AS pick
        FROM docs d CROSS JOIN vn2 v
        GROUP BY d.doc_id, d.dh
      ),
      red_named AS (
        SELECT f.doc_id, v.node AS node_reduced
        FROM red_assign f JOIN vn2 v ON v.vh = f.pick
      ),
      joined AS (
        SELECT doc_id, node_full, node_reduced
        FROM full_named JOIN red_named USING (doc_id)
      ),
      per_node AS (
        SELECT node_full AS node, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN node_full <> node_reduced
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
        FROM joined GROUP BY 1
      ),
      tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN node_full <> node_reduced
                        THEN 1 ELSE 0 END) AS BIGINT) AS moved_total,
               CAST(min(CASE WHEN node_full = 'n3'
                             OR node_full = node_reduced
                        THEN 1 ELSE 0 END) AS INTEGER) AS only_n3_moved
        FROM joined
      )
      SELECT node, n_docs, n_moved,
             CAST(moved_total AS DOUBLE) / CAST(n_total AS DOUBLE)
               AS moved_frac,
             only_n3_moved
      FROM per_node CROSS JOIN tot
      ORDER BY node
    """))

  /** Effective sample size of the DSIR importance weights, per source —
    * the audit that tells you whether weighted training actually USES
    * the corpus: ESS = (Σw)²/Σw², and ESS/n ≪ 1 means a few documents
    * carry all the mass (the resampling would collapse onto them). ESS
    * is scale-invariant, so the per-doc weights quantize ONCE to
    * nano-units (the same rounded weight [[importanceWeight]] ships)
    * and both sums are exact DECIMAL(38,0) — deterministic under any
    * partition order, one double division at the end. The oracle reads
    * the SAME shared `dsir` CTE chain, so the two queries cannot drift
    * on the weight definition. */
  val essAudit = QuerySpec(
    "q_ess",
    (s, d) => {
      val w = importanceWeight.run(s, d)
        .join(documents(s, d).select("doc_id", "source"), "doc_id")
        .select(col("source"),
          expr("CAST(round(weight * 1000000000) AS BIGINT)").as("wq"))
      val d38 = "decimal(38,0)"
      w.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("wq").cast(d38)).as("sw"),
          sum(col("wq").cast(d38) * col("wq")).as("sq"))
        .select(col("source"), col("n_docs"),
          // try_divide: all-zero weights (degen hollow) have no effective
          // sample size — NULL (DuckDB's x/0), not an ANSI error
          round(try_divide((col("sw") * col("sw")).cast("double"),
            col("sq").cast("double")), 6).as("ess"),
          round(try_divide((col("sw") * col("sw")).cast("double"),
            col("sq").cast("double") * col("n_docs").cast("double")), 6)
            .as("ess_ratio"))
        .orderBy("source")
    },
    Some(s"""
      WITH $DsirWeightSql,
      j AS (
        SELECT d.source,
               CAST(round(weight * 1000000000) AS BIGINT) AS wq
        FROM dsir JOIN documents d USING (doc_id)
      ),
      st AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(wq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sw,
               CAST(sum(CAST(wq AS DECIMAL(38,0)) * wq) AS DECIMAL(38,0))
                 AS sq
        FROM j GROUP BY source
      )
      SELECT source, n_docs,
             round(CAST(sw * sw AS DOUBLE) / CAST(sq AS DOUBLE), 6) AS ess,
             round(CAST(sw * sw AS DOUBLE)
                   / (CAST(sq AS DOUBLE) * CAST(n_docs AS DOUBLE)), 6)
               AS ess_ratio
      FROM st
      ORDER BY source
    """))

  val all: Seq[QuerySpec] = Seq(
    exportShards,
    hashSplit, chunkDocs, packSequences, domainCap, globalShuffle,
    truncateTokens, mixtureWeights, sourceDrift, ragIndex,
    importanceWeight, weightedSample, negativeSample, tokenizeIds,
    timeSplit, hashRing, essAudit)
}
