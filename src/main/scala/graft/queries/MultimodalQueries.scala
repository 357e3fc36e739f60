package graft.queries

import graft.Tables._
import graft.multimodal.Multimodal

/** Multimodal-column plumbing as a driver-verifiable query (SURVEY §2b E6).
  * The decode stage is a deterministic stub (no codecs in this container —
  * see Multimodal's STUB NOTE), which is precisely what makes it
  * oracle-able: DuckDB recomputes byte length / rolling fingerprint /
  * header byte from the same payload bytes (ASCII corpus → octet == ascii).
  */
object MultimodalQueries {

  val multimodal = QuerySpec(
    "q_multimodal",
    (s, d) =>
      Multimodal.decodeFeatures(s, Multimodal.packDocuments(documents(s, d)))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             'text' AS kind,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                                      list_transform(string_split(text, ''),
                                                     c -> CAST(ascii(c) AS BIGINT))),
                         (a, b) -> (a * 31 + b) % 1000000007) AS payload_fp,
             CAST(CASE WHEN length(text) = 0 THEN 1
                       ELSE (ascii(substr(text, 1, 1)) % 64) + 1
                  END AS INTEGER) AS fake_width
      FROM documents
      ORDER BY doc_id
    """))

  /** Frame sampling (video-path plumbing): 64-byte frames, every 4th kept,
    * one row per sampled frame via flatMap. Oracle regenerates the frame
    * grid with range/unnest and re-fingerprints each substr — exact on the
    * ASCII corpus (octet == ascii). */
  val frameSample = QuerySpec(
    "q_frame_sample",
    (s, d) =>
      Multimodal.sampleFrames(
          s, Multimodal.packDocuments(documents(s, d)), frameBytes = 64, every = 4)
        .orderBy("doc_id", "frame_idx"),
    Some("""
      WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, octet_length(encode(text)) // 64)) AS frame_idx
        FROM documents
      )
      SELECT doc_id,
             CAST(frame_idx AS INTEGER) AS frame_idx,
             64 AS n_bytes,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                                      list_transform(string_split(substr(text, CAST(frame_idx*64+1 AS INTEGER), 64), ''),
                                                     c -> CAST(ascii(c) AS BIGINT))),
                         (a, b) -> (a * 31 + b) % 1000000007) AS frame_fp
      FROM f
      WHERE frame_idx % 4 = 0
      ORDER BY doc_id, frame_idx
    """))

  val all: Seq[QuerySpec] = Seq(multimodal, frameSample)
}
