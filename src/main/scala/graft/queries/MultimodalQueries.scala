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

  /** REAL image decode through the gate: every doc_id deterministically
    * becomes a valid binary-PPM payload (dims and flat channel colors are
    * arithmetic in doc_id), built executor-side as actual P6 bytes; the
    * engine then runs parse → channel-mean decode AND parse → 2×
    * nearest-neighbor resize → re-encode → re-parse. The oracle computes
    * the SAME dims/means/halved-dims from doc_id arithmetic alone — a
    * broken header grammar, channel interleave, or resize geometry
    * hash-mismatches loudly. (Flat colors pin the channel means exactly;
    * gradient images are covered by MultimodalSpec's randomized
    * round-trip properties.) */
  val imageDecode = QuerySpec(
    "q_image_decode",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (id % 16 + 1).toInt
            val h = ((id * 7) % 16 + 1).toInt
            val r = ((id * 37) % 256).toByte
            val g = ((id * 57 + 11) % 256).toByte
            val b = ((id * 97 + 29) % 256).toByte
            val rgb = new Array[Byte](3 * w * h)
            var i = 0
            while (i < rgb.length) {
              rgb(i) = r; rgb(i + 1) = g; rgb(i + 2) = b; i += 3
            }
            (id, Multimodal.encodePpm(w, h, rgb))
          }
        }
        .toDF("doc_id", "payload")
      val halved = Multimodal
        .decodeImages(s, Multimodal.resizePpm(s, packed, 2))
        .select(col("doc_id"), col("width").as("half_width"),
          col("height").as("half_height"))
      Multimodal.decodeImages(s, packed)
        .join(halved, "doc_id")
        .select("doc_id", "width", "height", "mean_r", "mean_g", "mean_b",
          "half_width", "half_height")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(doc_id % 16 + 1 AS INTEGER) AS width,
             CAST((doc_id * 7) % 16 + 1 AS INTEGER) AS height,
             CAST((doc_id * 37) % 256 AS DOUBLE) AS mean_r,
             CAST((doc_id * 57 + 11) % 256 AS DOUBLE) AS mean_g,
             CAST((doc_id * 97 + 29) % 256 AS DOUBLE) AS mean_b,
             CAST((doc_id % 16 + 1 + 1) // 2 AS INTEGER) AS half_width,
             CAST(((doc_id * 7) % 16 + 1 + 1) // 2 AS INTEGER) AS half_height
      FROM documents
      ORDER BY doc_id
    """))

  val all: Seq[QuerySpec] = Seq(multimodal, frameSample, imageDecode)
}
