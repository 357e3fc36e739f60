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

  /** E3 scale path: IVF — seeded k-means coarse quantizer, probe the 8
    * nearest of 16 cells, brute-force within (synthetic embeddings are
    * near-uniform, so the quantizer needs a generous nProbe; clustered
    * real corpora prune much harder). Engine-specific (MLlib k-means) → no
    * SQL oracle; EntrySpec asserts recall ≥ 0.6 against the exact top-k. */
  val similarityAnn = QuerySpec(
    "q_similarity_ann",
    (s, d) => {
      val emb = embeddings(s, d)
      val probe = Similarity.probeVector(emb, "vec_id", ProbeId)
      val (assigned, centroids) = Similarity.ivfAssign(s, emb, nCells = 16)
      Similarity.ivfTopK(assigned, centroids, "vec_id", probe,
        k = 20, nProbe = 8, excludeId = Some(ProbeId))
    },
    None)

  val all: Seq[QuerySpec] = Seq(similarityTopk, similarityAnn)
}
