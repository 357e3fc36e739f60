package graft.queries

import graft.Tables._
import graft.multimodal.Multimodal

/** Multimodal-column plumbing as a driver-verifiable query (SURVEY §2b E6).
  * Most formats here decode with REAL in-repo codecs (PPM/BMP/WAV/AVI/PNG/
  * GIF fully, JPEG via JDK ImageIO, MP4/MP3 at container level); only the
  * q_multimodal packing gate below uses a deterministic text-payload stub
  * — and only because that is what makes the PLUMBING oracle-able: DuckDB
  * recomputes byte length / rolling fingerprint / header byte from the
  * same payload bytes (ASCII corpus → octet == ascii). The one genuinely
  * stubbed DECODE path is MP4/MP3 entropy-coded payloads (no codec in the
  * JDK; Multimodal.scala's STUB NOTE states it precisely).
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

  /** REAL audio decode through the gate — the WAV sibling of
    * q_image_decode: every doc_id deterministically becomes a valid
    * RIFF/WAVE 16-bit PCM payload (channel count, sample rate, frame
    * count and a ±a square-wave amplitude are arithmetic in doc_id),
    * built executor-side as actual little-endian bytes; the engine then
    * runs chunk-walk parse → peak/mean-abs decode AND parse → 2× frame
    * decimation → re-encode → re-parse. The oracle computes the SAME
    * geometry and amplitude stats from doc_id arithmetic alone — a broken
    * chunk walk, sample sign-extension, or decimation geometry
    * hash-mismatches loudly. (The constant |sample| pins mean_abs
    * exactly; random waveforms are covered by MultimodalSpec's
    * round-trip properties.) */
  val audioDecode = QuerySpec(
    "q_audio_decode",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val ch = (id % 2 + 1).toInt
            val rate = (8000 + (id % 4) * 4000).toInt
            val nFrames = (id % 32 + 1).toInt
            val a = ((id * 31) % 1000).toInt
            val samples = new Array[Short](nFrames * ch)
            var f = 0
            while (f < nFrames) {
              val v = (if (f % 2 == 0) a else -a).toShort
              var c = 0
              while (c < ch) { samples(f * ch + c) = v; c += 1 }
              f += 1
            }
            (id, Multimodal.encodeWav(ch, rate, samples))
          }
        }
        .toDF("doc_id", "payload")
      val halved = Multimodal
        .decodeAudio(s, Multimodal.resampleWav(s, packed, 2))
        .select(col("doc_id"), col("n_frames").as("half_frames"),
          col("sample_rate").as("half_rate"))
      Multimodal.decodeAudio(s, packed)
        .join(halved, "doc_id")
        .select("doc_id", "n_channels", "sample_rate", "n_frames", "peak",
          "mean_abs", "half_frames", "half_rate")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(doc_id % 2 + 1 AS INTEGER) AS n_channels,
             CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
             CAST(doc_id % 32 + 1 AS INTEGER) AS n_frames,
             CAST((doc_id * 31) % 1000 AS INTEGER) AS peak,
             CAST((doc_id * 31) % 1000 AS DOUBLE) AS mean_abs,
             CAST((doc_id % 32 + 1 + 1) // 2 AS INTEGER) AS half_frames,
             CAST((8000 + (doc_id % 4) * 4000) // 2 AS INTEGER) AS half_rate
      FROM documents
      ORDER BY doc_id
    """))

  /** REAL video decode through the gate — the AVI sibling completing the
    * image/audio/video triple: every doc_id deterministically becomes a
    * valid single-stream uncompressed-BI_RGB AVI (dims, frame count,
    * per-frame timing, and a flat per-FRAME BGR color are arithmetic in
    * doc_id), built executor-side as actual RIFF bytes; the engine then
    * runs the two-level chunk walk → stride-aware channel means AND
    * parse → 2× frame decimation → re-encode → re-parse → means over the
    * KEPT frames. The oracle computes the same geometry and channel
    * means from doc_id arithmetic alone (exact integer sums, one IEEE
    * division each) — a broken list walk, BGR order, stride handling, or
    * a decimation that keeps the wrong frames hash-mismatches loudly.
    * Colors varying per FRAME (not per pixel) make the post-decimation
    * mean pin frame SELECTION, not just the count. */
  val videoDecode = QuerySpec(
    "q_video_decode",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (id % 6 + 2).toInt
            val h = ((id * 3) % 5 + 2).toInt
            val n = (id % 4 + 2).toInt
            val mpf = ((id % 3 + 1) * 20000).toInt
            val stride = (3 * w + 3) & ~3
            val frames = (0 until n).map { f =>
              val b = ((id * 11 + f * 17) % 256).toByte
              val g = ((id * 29 + f * 23 + 7) % 256).toByte
              val r = ((id * 41 + f * 31 + 13) % 256).toByte
              val fr = new Array[Byte](stride * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = y * stride + 3 * x
                  fr(p) = b; fr(p + 1) = g; fr(p + 2) = r
                  x += 1
                }
                y += 1
              }
              fr
            }
            (id, Multimodal.encodeAvi(w, h, mpf, frames))
          }
        }
        .toDF("doc_id", "payload")
      val halved = Multimodal
        .decodeVideo(s, Multimodal.decimateAvi(s, packed, 2))
        .select(col("doc_id"), col("n_frames").as("half_frames"),
          col("micros_per_frame").as("half_mpf"),
          col("mean_b").as("half_mean_b"))
      Multimodal.decodeVideo(s, packed)
        .join(halved, "doc_id")
        .select("doc_id", "width", "height", "n_frames", "micros_per_frame",
          "mean_b", "mean_g", "mean_r", "half_frames", "half_mpf",
          "half_mean_b")
        .orderBy("doc_id")
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               CAST(doc_id % 6 + 2 AS BIGINT) AS w,
               CAST((doc_id * 3) % 5 + 2 AS BIGINT) AS h,
               CAST(doc_id % 4 + 2 AS BIGINT) AS n
        FROM documents
      )
      SELECT doc_id,
             CAST(w AS INTEGER) AS width,
             CAST(h AS INTEGER) AS height,
             CAST(n AS INTEGER) AS n_frames,
             CAST((doc_id % 3 + 1) * 20000 AS INTEGER) AS micros_per_frame,
             CAST(w * h * list_sum(list_transform(range(0, n),
                    f -> (doc_id * 11 + f * 17) % 256)) AS DOUBLE)
               / CAST(w * h * n AS DOUBLE) AS mean_b,
             CAST(w * h * list_sum(list_transform(range(0, n),
                    f -> (doc_id * 29 + f * 23 + 7) % 256)) AS DOUBLE)
               / CAST(w * h * n AS DOUBLE) AS mean_g,
             CAST(w * h * list_sum(list_transform(range(0, n),
                    f -> (doc_id * 41 + f * 31 + 13) % 256)) AS DOUBLE)
               / CAST(w * h * n AS DOUBLE) AS mean_r,
             CAST((n + 1) // 2 AS INTEGER) AS half_frames,
             CAST((doc_id % 3 + 1) * 40000 AS INTEGER) AS half_mpf,
             CAST(w * h * list_sum(list_transform(
                    list_filter(range(0, n), f -> f % 2 = 0),
                    f -> (doc_id * 11 + f * 17) % 256)) AS DOUBLE)
               / CAST(w * h * ((n + 1) // 2) AS DOUBLE) AS half_mean_b
      FROM g
      ORDER BY doc_id
    """))

  /** REAL compressed-image decode through the gate: every doc_id becomes
    * a valid 8-bit truecolor PNG (flat arithmetic color; the row filter
    * CYCLES through all five types y mod 5, so None/Sub/Up/Average/Paeth
    * inversion ALL sit on the hash gate, not just in the spec), built
    * executor-side with a real zlib deflate + CRC'd chunks; the engine
    * then runs signature/CRC walk → inflate → defilter → channel means,
    * AND the cross-format transcode: PNG → P6 re-encode → the PPM
    * decoder must see the identical means (the two decoders share
    * nothing but the pixel contract). Oracle: pure doc_id arithmetic.
    * PNG is the compressed format a bare JVM owns BIT-EXACTLY
    * (java.util.zip IS zlib); lossy JPEG gets the tolerance-verdict
    * gate in q_jpeg_decode instead. */
  val pngDecode = QuerySpec(
    "q_png_decode",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (id % 7 + 1).toInt
            val h = ((id * 5) % 6 + 1).toInt
            val r = ((id * 23) % 256).toByte
            val g = ((id * 71 + 3) % 256).toByte
            val b = ((id * 13 + 7) % 256).toByte
            val rgb = new Array[Byte](3 * w * h)
            var i = 0
            while (i < rgb.length) {
              rgb(i) = r; rgb(i + 1) = g; rgb(i + 2) = b; i += 3
            }
            (id, Multimodal.encodePng(w, h, rgb, y => y % 5))
          }
        }
        .toDF("doc_id", "payload")
      val viaPpm = Multimodal
        .decodeImages(s, Multimodal.pngToPpm(s, packed))
        .select(col("doc_id"), col("mean_r").as("ppm_mean_r"),
          col("mean_b").as("ppm_mean_b"))
      Multimodal.decodePngImages(s, packed)
        .join(viaPpm, "doc_id")
        .select("doc_id", "width", "height", "mean_r", "mean_g", "mean_b",
          "ppm_mean_r", "ppm_mean_b")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(doc_id % 7 + 1 AS INTEGER) AS width,
             CAST((doc_id * 5) % 6 + 1 AS INTEGER) AS height,
             CAST((doc_id * 23) % 256 AS DOUBLE) AS mean_r,
             CAST((doc_id * 71 + 3) % 256 AS DOUBLE) AS mean_g,
             CAST((doc_id * 13 + 7) % 256 AS DOUBLE) AS mean_b,
             CAST((doc_id * 23) % 256 AS DOUBLE) AS ppm_mean_r,
             CAST((doc_id * 13 + 7) % 256 AS DOUBLE) AS ppm_mean_b
      FROM documents
      ORDER BY doc_id
    """))

  /** REAL palette-indexed decode through the gate: every doc_id becomes
    * a valid GIF87a (4-color arithmetic palette, index pattern
    * (id + p) mod 4 over the pixel sequence — a pattern that exercises
    * LZW dictionary growth every row), compressed with the HAND-ROLLED
    * LZW encoder and decoded by the hand-rolled variable-width LZW
    * decoder (PNG leans on java.util.zip; GIF's decompressor is ours,
    * KwKwK case and all). Channel means are palette-weighted exact
    * integers; the oracle replays palette and pattern from doc_id
    * arithmetic alone. */
  val gifDecode = QuerySpec(
    "q_gif_decode",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (id % 6 + 1).toInt
            val h = ((id * 7) % 7 + 1).toInt
            val palette = Array.tabulate(4)(c => Array(
              ((id * 19 + c * 47) % 256).toInt,
              ((id * 31 + c * 59 + 5) % 256).toInt,
              ((id * 43 + c * 67 + 11) % 256).toInt))
            val indices = Array.tabulate(w * h)(p => ((id + p) % 4).toByte)
            (id, Multimodal.encodeGif87a(w, h, palette, indices))
          }
        }
        .toDF("doc_id", "payload")
      Multimodal.decodeGifImages(s, packed)
        .select("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")
        .orderBy("doc_id")
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               CAST(doc_id % 6 + 1 AS BIGINT) AS w,
               CAST((doc_id * 7) % 7 + 1 AS BIGINT) AS h
        FROM documents
      )
      SELECT doc_id,
             CAST(w AS INTEGER) AS width,
             CAST(h AS INTEGER) AS height,
             CAST(list_sum(list_transform(range(0, w * h),
                    p -> (doc_id * 19 + ((doc_id + p) % 4) * 47) % 256))
                  AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_r,
             CAST(list_sum(list_transform(range(0, w * h),
                    p -> (doc_id * 31 + ((doc_id + p) % 4) * 59 + 5) % 256))
                  AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_g,
             CAST(list_sum(list_transform(range(0, w * h),
                    p -> (doc_id * 43 + ((doc_id + p) % 4) * 67 + 11) % 256))
                  AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_b
      FROM g
      ORDER BY doc_id
    """))

  /** REAL DCT-compressed decode through the gate — baseline JPEG via
    * the JDK's own bundled codec (javax.imageio; the one codec-bound
    * format a bare JVM genuinely ships): every doc_id becomes a
    * flat-color JPEG built executor-side (dims 1..9 × 1..10, so edge
    * MCUs — images narrower than one 8×8 block — sit on the gate too),
    * then decoded back through the full SOS entropy decode + dequant +
    * IDCT + YCbCr→RGB pipeline. JPEG is LOSSY and IDCT is not
    * bit-pinned across implementations, so the gate is the
    * q_similarity_ann VERDICT pattern: dimensions compare exactly
    * (structural truth), channel means must land within ±8 of the
    * encoded flat color (flat color ⇒ DC-only blocks; the residual is
    * DC quantization + YCbCr rounding, empirically ≤ 3 at q=0.95 —
    * tolerance leaves headroom without admitting a wrong image, whose
    * means shift by tens). A payload that fails to decode DROPS its
    * row and fails the rows gate. */
  val jpegDecode = QuerySpec(
    "q_jpeg_decode",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{abs, col}
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (id % 9 + 1).toInt
            val h = ((id * 5) % 10 + 1).toInt
            val rgb = new Array[Byte](3 * w * h)
            var i = 0
            while (i < rgb.length) {
              rgb(i) = ((id * 37) % 256).toByte
              rgb(i + 1) = ((id * 53 + 9) % 256).toByte
              rgb(i + 2) = ((id * 17 + 4) % 256).toByte
              i += 3
            }
            (id, Multimodal.encodeJpeg(w, h, rgb))
          }
        }
        .toDF("doc_id", "payload")
      Multimodal.decodeJpegImages(s, packed)
        .withColumn("color_ok",
          (abs(col("mean_r") - (col("doc_id") * 37) % 256) <= 8 &&
           abs(col("mean_g") - (col("doc_id") * 53 + 9) % 256) <= 8 &&
           abs(col("mean_b") - (col("doc_id") * 17 + 4) % 256) <= 8)
            .cast("int"))
        .select("doc_id", "width", "height", "color_ok")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(doc_id % 9 + 1 AS INTEGER) AS width,
             CAST((doc_id * 5) % 10 + 1 AS INTEGER) AS height,
             1 AS color_ok
      FROM documents
      ORDER BY doc_id
    """))

  /** Cross-codec-family transcode through the gate: JPEG (lossy, JDK
    * codec) → PNG (lossless, hand-rolled container + zlib) → decode.
    * The lossy step happens exactly once — after it, the pixel plane is
    * under the bit-exact regime, so the PNG-leg channel means must equal
    * the direct JPEG-decode means TO THE LAST BIT (transcode_exact), not
    * within a tolerance; the tolerance verdict (±8, q_jpeg_decode's
    * band) applies only against the originally-encoded flat color. Dims
    * ride both containers exactly. A mismatch anywhere — a dropped row,
    * a filter-inversion bug in the PNG leg, a second lossy step —
    * hash-mismatches. */
  val jpegTranscode = QuerySpec(
    "q_jpeg_transcode",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{abs, col}
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (id % 11 + 1).toInt
            val h = ((id * 3) % 9 + 1).toInt
            val rgb = new Array[Byte](3 * w * h)
            var i = 0
            while (i < rgb.length) {
              rgb(i) = ((id * 29 + 5) % 256).toByte
              rgb(i + 1) = ((id * 43 + 11) % 256).toByte
              rgb(i + 2) = ((id * 61 + 2) % 256).toByte
              i += 3
            }
            (id, Multimodal.encodeJpeg(w, h, rgb))
          }
        }
        .toDF("doc_id", "payload")
      val direct = Multimodal.decodeJpegImages(s, packed)
      val viaPng = Multimodal
        .decodePngImages(s, Multimodal.jpegToPng(s, packed))
        .select(col("doc_id"), col("width").as("png_w"),
          col("height").as("png_h"), col("mean_r").as("png_r"),
          col("mean_g").as("png_g"), col("mean_b").as("png_b"))
      direct.join(viaPng, "doc_id")
        .select(
          col("doc_id"), col("width"), col("height"),
          (col("width") === col("png_w") && col("height") === col("png_h") &&
            col("mean_r") === col("png_r") && col("mean_g") === col("png_g") &&
            col("mean_b") === col("png_b")).cast("int").as("transcode_exact"),
          (abs(col("mean_r") - (col("doc_id") * 29 + 5) % 256) <= 8 &&
            abs(col("mean_g") - (col("doc_id") * 43 + 11) % 256) <= 8 &&
            abs(col("mean_b") - (col("doc_id") * 61 + 2) % 256) <= 8)
            .cast("int").as("color_ok"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(doc_id % 11 + 1 AS INTEGER) AS width,
             CAST((doc_id * 3) % 9 + 1 AS INTEGER) AS height,
             1 AS transcode_exact,
             1 AS color_ok
      FROM documents
      ORDER BY doc_id
    """))

  /** Format SNIFFING through the gate — the dispatch stage of a real
    * media pipeline: a MIXED column (doc_id mod 6 selects PPM / WAV /
    * AVI / PNG / GIF / JPEG, each built by the same arithmetic
    * generators the per-format queries pin), identified executor-side
    * by structure and routed to the right decoder
    * ([[graft.multimodal.Multimodal.sniffAndDecode]]). The gate proves
    * the six parsers MUTUALLY EXCLUSIVE on real payloads at corpus
    * scale: one output row per doc, kind exactly as generated, the
    * format's primary metric exactly as the per-format arithmetic says
    * — a mis-sniff changes kind or metric and hash-mismatches. JPEG's
    * metric is the structural w·1000+h (its content means are
    * decoder-specific; q_jpeg_decode holds the tolerance gate), which
    * is still exact dispatch evidence: a payload routed to any other
    * parser would be rejected and drop the row. */
  val mediaDispatch = QuerySpec(
    "q_media_dispatch",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val payload = (id % 6) match {
              case 0 =>
                val w = (id % 16 + 1).toInt
                val h = ((id * 7) % 16 + 1).toInt
                val rgb = new Array[Byte](3 * w * h)
                var i = 0
                while (i < rgb.length) {
                  rgb(i) = ((id * 37) % 256).toByte
                  rgb(i + 1) = ((id * 57 + 11) % 256).toByte
                  rgb(i + 2) = ((id * 97 + 29) % 256).toByte
                  i += 3
                }
                Multimodal.encodePpm(w, h, rgb)
              case 1 =>
                val ch = (id % 2 + 1).toInt
                val nFrames = (id % 32 + 1).toInt
                val a = ((id * 31) % 1000).toInt
                val samples = new Array[Short](nFrames * ch)
                var f = 0
                while (f < nFrames) {
                  val v = (if (f % 2 == 0) a else -a).toShort
                  var c = 0
                  while (c < ch) { samples(f * ch + c) = v; c += 1 }
                  f += 1
                }
                Multimodal.encodeWav(ch, (8000 + (id % 4) * 4000).toInt, samples)
              case 2 =>
                val w = (id % 6 + 2).toInt
                val h = ((id * 3) % 5 + 2).toInt
                val n = (id % 4 + 2).toInt
                val stride = (3 * w + 3) & ~3
                val frames = (0 until n).map { f =>
                  val fr = new Array[Byte](stride * h)
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val p = y * stride + 3 * x
                      fr(p) = ((id * 11 + f * 17) % 256).toByte
                      fr(p + 1) = ((id * 29 + f * 23 + 7) % 256).toByte
                      fr(p + 2) = ((id * 41 + f * 31 + 13) % 256).toByte
                      x += 1
                    }
                    y += 1
                  }
                  fr
                }
                Multimodal.encodeAvi(w, h, ((id % 3 + 1) * 20000).toInt, frames)
              case 3 =>
                val w = (id % 7 + 1).toInt
                val h = ((id * 5) % 6 + 1).toInt
                val rgb = new Array[Byte](3 * w * h)
                var i = 0
                while (i < rgb.length) {
                  rgb(i) = ((id * 23) % 256).toByte
                  rgb(i + 1) = ((id * 71 + 3) % 256).toByte
                  rgb(i + 2) = ((id * 13 + 7) % 256).toByte
                  i += 3
                }
                Multimodal.encodePng(w, h, rgb, y => y % 5)
              case 4 =>
                val w = (id % 6 + 1).toInt
                val h = ((id * 7) % 7 + 1).toInt
                val palette = Array.tabulate(4)(c => Array(
                  ((id * 19 + c * 47) % 256).toInt,
                  ((id * 31 + c * 59 + 5) % 256).toInt,
                  ((id * 43 + c * 67 + 11) % 256).toInt))
                Multimodal.encodeGif87a(w, h, palette,
                  Array.tabulate(w * h)(p => ((id + p) % 4).toByte))
              case _ =>
                val w = (id % 9 + 1).toInt
                val h = ((id * 5) % 10 + 1).toInt
                val rgb = new Array[Byte](3 * w * h)
                var i = 0
                while (i < rgb.length) {
                  rgb(i) = ((id * 37) % 256).toByte
                  rgb(i + 1) = ((id * 53 + 9) % 256).toByte
                  rgb(i + 2) = ((id * 17 + 4) % 256).toByte
                  i += 3
                }
                Multimodal.encodeJpeg(w, h, rgb)
            }
            (id, payload)
          }
        }
        .toDF("doc_id", "payload")
      Multimodal.sniffAndDecode(s, packed).orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CASE doc_id % 6
               WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav' WHEN 2 THEN 'avi'
               WHEN 3 THEN 'png' WHEN 4 THEN 'gif' ELSE 'jpeg' END AS kind,
             CASE doc_id % 6
               WHEN 0 THEN CAST((doc_id * 37) % 256 AS DOUBLE)
               WHEN 1 THEN CAST((doc_id * 31) % 1000 AS DOUBLE)
               WHEN 2 THEN
                 CAST((doc_id % 6 + 2) * ((doc_id * 3) % 5 + 2)
                      * list_sum(list_transform(range(0, doc_id % 4 + 2),
                          f -> (doc_id * 11 + f * 17) % 256)) AS DOUBLE)
                 / CAST((doc_id % 6 + 2) * ((doc_id * 3) % 5 + 2)
                        * (doc_id % 4 + 2) AS DOUBLE)
               WHEN 3 THEN CAST((doc_id * 23) % 256 AS DOUBLE)
               WHEN 4 THEN
                 CAST(list_sum(list_transform(
                        range(0, (doc_id % 6 + 1) * ((doc_id * 7) % 7 + 1)),
                        p -> (doc_id * 19 + ((doc_id + p) % 4) * 47) % 256))
                      AS DOUBLE)
                 / CAST((doc_id % 6 + 1) * ((doc_id * 7) % 7 + 1) AS DOUBLE)
               ELSE CAST((doc_id % 9 + 1) * 1000
                         + (doc_id * 5) % 10 + 1 AS DOUBLE)
             END AS metric
      FROM documents
      ORDER BY doc_id
    """))

  /** REAL ISO-BMFF (MP4) container demux under the hash gate: every
    * doc_id becomes a valid MP4 (ftyp/mdat/moov with full sample tables
    * — run-length stts, one-chunk stsc, per-sample stsz, stco) built by
    * the hand-rolled muxer; the engine then box-walks it back
    * (Multimodal.parseMp4), cross-validates tkhd/stsd/stts/stsz/stco,
    * resolves every sample's absolute extent, and reports exact
    * byte-level statistics — plus the container-level frame-sampling op
    * twice (every 2nd sample's total bytes; the second sample's byte
    * sum), which pins sample SELECTION and extent resolution, not just
    * counts. Codec decode of the sample payloads stays honestly out of
    * scope (stsd fourcc 'raw ' surfaced); the demux IS the pipeline-
    * relevant half — frames are chosen at the container layer before
    * any codec spend. Oracle: pure doc_id arithmetic. */
  val mp4Demux = QuerySpec(
    "q_mp4_demux",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, count, lit, sum}
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val n = (id % 4 + 2).toInt
            val w = (id % 6 + 2).toInt
            val h = ((id * 3) % 5 + 2).toInt
            val ts = (1000 + id % 5).toInt
            val durs = (0 until n).map(f => (((id + f) % 3 + 1) * 100).toInt)
            val bodies = (0 until n).map { f =>
              val sz = ((id + 7 * f) % 9 + 1).toInt
              Array.fill(sz)(((id * 11 + f * 17) % 256).toByte)
            }
            (id, Multimodal.encodeMp4(w, h, ts, durs, bodies))
          }
        }
        .toDF("doc_id", "payload")
      val demux = Multimodal.demuxMp4(s, packed)
      val kept = Multimodal.sampleMp4(s, packed, 2).groupBy("doc_id")
        .agg(count(lit(1)).as("kept_n"), sum("n_bytes").as("kept_bytes"))
      val second = Multimodal.sampleMp4(s, packed, 1)
        .filter(col("sample_idx") === 1)
        .select(col("doc_id"), col("byte_sum").as("second_sample_sum"))
      demux.join(kept, "doc_id").join(second, "doc_id")
        .select("doc_id", "width", "height", "timescale", "duration_ticks",
          "n_samples", "bytes_total", "mean_sample_byte", "kept_n",
          "kept_bytes", "second_sample_sum")
        .orderBy("doc_id")
    },
    Some("""
      WITH g AS (
        SELECT doc_id, CAST(doc_id % 4 + 2 AS BIGINT) AS n FROM documents
      )
      SELECT doc_id,
             CAST(doc_id % 6 + 2 AS INTEGER) AS width,
             CAST((doc_id * 3) % 5 + 2 AS INTEGER) AS height,
             CAST(1000 + doc_id % 5 AS BIGINT) AS timescale,
             CAST(list_sum(list_transform(range(0, n),
                    f -> ((doc_id + f) % 3 + 1) * 100)) AS BIGINT)
               AS duration_ticks,
             CAST(n AS INTEGER) AS n_samples,
             CAST(list_sum(list_transform(range(0, n),
                    f -> (doc_id + 7 * f) % 9 + 1)) AS BIGINT) AS bytes_total,
             CAST(list_sum(list_transform(range(0, n),
                    f -> ((doc_id + 7 * f) % 9 + 1)
                         * ((doc_id * 11 + f * 17) % 256))) AS DOUBLE)
               / CAST(list_sum(list_transform(range(0, n),
                        f -> (doc_id + 7 * f) % 9 + 1)) AS DOUBLE)
               AS mean_sample_byte,
             CAST((n + 1) // 2 AS BIGINT) AS kept_n,
             CAST(list_sum(list_transform(
                    list_filter(range(0, n), f -> f % 2 = 0),
                    f -> (doc_id + 7 * f) % 9 + 1)) AS BIGINT) AS kept_bytes,
             CAST(((doc_id + 7) % 9 + 1) * ((doc_id * 11 + 17) % 256)
                  AS BIGINT) AS second_sample_sum
      FROM g
      ORDER BY doc_id
    """))

  /** REAL MPEG-1 Layer III frame walk under the gate (the audio sibling
    * of q_mp4_demux): every doc_id becomes a conformant VBR MP3 stream —
    * real sync words, table-driven frame lengths (144·bitrate/rate +
    * padding), per-frame bitrate AND padding varying, half the docs
    * ID3v2-prefixed so the synchsafe-size skip sits on the hash gate.
    * The engine walks it back (Multimodal.parseMp3): frame count, exact
    * VBR mean bitrate, duration at 1152 samples/frame, and the exact
    * payload byte sum (extent resolution, not just counting). Spectral
    * decode is honestly out of scope; the frame walk IS what a pipeline
    * needs (duration/bitrate filters, frame extents). Oracle: the
    * bitrate/samplerate TABLES as list literals + doc_id arithmetic. */
  val mp3Frames = QuerySpec(
    "q_mp3_frames",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val srIdx = (id % 3).toInt
            val n = (id % 4 + 2).toInt
            val frames = (0 until n).map { f =>
              (((id + f) % 14 + 1).toInt, ((id + f) % 2).toInt,
                ((id * 11 + f * 17) % 256).toByte)
            }
            val id3 =
              if (id % 2 == 0) Array.fill((id % 5 + 1).toInt)(65.toByte)
              else Array.empty[Byte]
            (id, Multimodal.encodeMp3(srIdx, frames, id3))
          }
        }
        .toDF("doc_id", "payload")
      Multimodal.decodeMp3Frames(s, packed).orderBy("doc_id")
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               CAST(doc_id % 4 + 2 AS BIGINT) AS n,
               list_extract([44100, 48000, 32000],
                            CAST(doc_id % 3 + 1 AS INTEGER)) AS sr
        FROM documents
      ),
      per AS (
        SELECT doc_id, n, sr,
               list_transform(range(0, n), f -> list_extract(
                 [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                  256, 320], CAST((doc_id + f) % 14 + 1 AS INTEGER)))
                 AS kbps,
               list_transform(range(0, n), f -> (doc_id + f) % 2) AS pads,
               list_transform(range(0, n), f -> (doc_id * 11 + f * 17) % 256)
                 AS fills
        FROM g
      ),
      lens AS (
        SELECT doc_id, n, sr, kbps,
               list_transform(range(1, CAST(n + 1 AS INTEGER)),
                 i -> 144000 * list_extract(kbps, CAST(i AS INTEGER)) // sr
                      + list_extract(pads, CAST(i AS INTEGER))) AS len,
               fills
        FROM per
      )
      SELECT doc_id,
             CAST(n AS INTEGER) AS n_frames,
             CAST(sr AS INTEGER) AS sample_rate,
             CAST(list_sum(len)
                  + CASE WHEN doc_id % 2 = 0
                         THEN 10 + doc_id % 5 + 1 ELSE 0 END
                  AS INTEGER) AS total_bytes,
             CAST(list_sum(kbps) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_kbps,
             CAST(n * 1152000 AS DOUBLE) / CAST(sr AS DOUBLE) AS duration_ms,
             CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INTEGER)),
                    i -> (list_extract(len, CAST(i AS INTEGER)) - 4)
                         * list_extract(fills, CAST(i AS INTEGER))))
                  AS BIGINT) AS payload_sum
      FROM lens
      ORDER BY doc_id
    """))

  /** REAL BMP decode through the gate — the uncompressed-DIB sibling of
    * q_image_decode: every doc_id deterministically becomes a valid
    * bottom-up 24-bit BI_RGB BMP (dims and PER-ROW channel colors are
    * arithmetic in doc_id; widths 5–11 exercise every row-padding
    * residue, row-varying colors make orientation observable), built
    * executor-side as actual bytes via [[Multimodal.encodeBmp]]. The
    * engine parses the container back ([[Multimodal.decodeBmpImages]]);
    * the oracle recomputes exact channel SUMS and the image-space
    * top-left pixel from doc_id arithmetic alone — a broken stride,
    * BGR interleave, or bottom-up handling hash-mismatches loudly. */
  val bmpDecode = QuerySpec(
    "q_bmp_decode",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (id % 7 + 5).toInt
            val h = ((id * 3) % 6 + 3).toInt
            val rgb = new Array[Byte](3 * w * h)
            var y = 0
            while (y < h) {
              val r = ((id * 37 + y * 11) % 256).toByte
              val g = ((id * 57 + y * 13 + 11) % 256).toByte
              val b = ((id * 97 + y * 17 + 29) % 256).toByte
              var x = 0
              while (x < w) {
                val i = 3 * (y * w + x)
                rgb(i) = r; rgb(i + 1) = g; rgb(i + 2) = b
                x += 1
              }
              y += 1
            }
            (id, Multimodal.encodeBmp(w, h, rgb))
          }
        }
        .toDF("doc_id", "payload")
      Multimodal.decodeBmpImages(s, packed).orderBy("doc_id")
    },
    Some("""
      WITH dims AS (
        SELECT doc_id,
               CAST(doc_id % 7 + 5 AS BIGINT) AS w,
               CAST((doc_id * 3) % 6 + 3 AS BIGINT) AS h
        FROM documents
      ),
      rows_ AS (
        SELECT doc_id, w, h, unnest(range(h)) AS y FROM dims
      ),
      sums AS (
        SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
               CAST(sum((doc_id * 37 + y * 11) % 256) AS BIGINT) AS sr,
               CAST(sum((doc_id * 57 + y * 13 + 11) % 256) AS BIGINT) AS sg,
               CAST(sum((doc_id * 97 + y * 17 + 29) % 256) AS BIGINT) AS sb
        FROM rows_ GROUP BY doc_id
      )
      SELECT doc_id,
             CAST(w AS INTEGER) AS width,
             CAST(h AS INTEGER) AS height,
             CAST(w * sr AS BIGINT) AS sum_r,
             CAST(w * sg AS BIGINT) AS sum_g,
             CAST(w * sb AS BIGINT) AS sum_b,
             CAST((doc_id * 37) % 256 AS INTEGER) AS top_r,
             CAST((doc_id * 57 + 11) % 256 AS INTEGER) AS top_g,
             CAST((doc_id * 97 + 29) % 256 AS INTEGER) AS top_b
      FROM sums
      ORDER BY doc_id
    """))

  /** Perceptual-hash image dedup end-to-end: deterministic 16×16 P6
    * images whose 8×8 cell pattern IS a 60-bit md5-derived class
    * signature (class c = doc_id % 100) with the low v = (doc_id÷100)%4
    * bits flipped — so same-class renditions sit within Hamming 3 and
    * cross-class images at ≥ 13 (the 100 fixed md5 patterns have
    * pairwise distance ≥ 16; v-flips move ≤ 3 bits — checked offline,
    * deterministic forever). [[Multimodal.averageHash]] must recover
    * each signature bit-exactly (popcounts 20–43 keep the mean
    * threshold non-degenerate), and [[graft.ops.Similarity
    * .hammingPairs]] (4×15-bit bands — exact for distance ≤ 3 by
    * pigeonhole) must find exactly the same-class pairs. The oracle
    * rebuilds every hash from md5 arithmetic (both engines agree on
    * md5 hex), pairs classes directly, and replays hash_a and the
    * pairwise distances bit-for-bit: a wrong grid boundary, threshold
    * tie, band shift, or bucket cap shows up as a missing/extra pair or
    * a wrong hash. Output: total pair count + the 100 closest pairs. */
  val imageHash = QuerySpec(
    "q_image_hash",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val packed = documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          val md = java.security.MessageDigest.getInstance("MD5")
          ids.map { id =>
            val c = (id % 100).toInt
            val v = ((id / 100) % 4).toInt
            md.reset()
            val hex = md.digest(s"imghash:$c".getBytes("US-ASCII"))
              .map(b => f"${b & 0xFF}%02x").mkString
            val pattern = java.lang.Long.parseLong(hex.substring(0, 15), 16)
            val hash = pattern ^ ((1L << v) - 1)
            val rgb = new Array[Byte](3 * 16 * 16)
            var y = 0
            while (y < 16) {
              var x = 0
              while (x < 16) {
                val bit = (hash >>> ((y / 2) * 8 + x / 2)) & 1L
                val value = if (bit == 1L) 255.toByte else 0.toByte
                val i = 3 * (y * 16 + x)
                rgb(i) = value; rgb(i + 1) = value; rgb(i + 2) = value
                x += 1
              }
              y += 1
            }
            (id, Multimodal.encodePpm(16, 16, rgb))
          }
        }
        .toDF("doc_id", "payload")
      val hashes = Multimodal.averageHash(s, packed)
      // materialized: the total-count branch and the top-100 projection
      // both consume the pair list — unmaterialized, the banded self-join
      // (and everything above it) ran twice (r11 optimization; the pair
      // list is band-bucket-capped, so the checkpoint is bounded)
      val pairs = graft.ops.Checkpoints.materialize(
        graft.ops.Similarity.hammingPairs(
          hashes, "doc_id", "ahash", bands = 4, bandBits = 15, maxHam = 6))
      val tot = pairs.agg(count(lit(1)).as("n_pairs"))
      pairs.crossJoin(broadcast(tot))
        .select(col("key_a").as("doc_a"), col("key_b").as("doc_b"),
          col("hamming"), col("hash_a"), col("n_pairs"))
        .orderBy("hamming", "doc_a", "doc_b")
        .limit(100)
    },
    Some("""
      WITH img AS (
        SELECT doc_id,
               xor(CAST(('0x' || substr(md5('imghash:' ||
                          CAST(doc_id % 100 AS VARCHAR)), 1, 15)) AS BIGINT),
                   CAST((1 << ((doc_id // 100) % 4)) - 1 AS BIGINT)) AS h
        FROM documents
      ),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS hamming,
               a.h AS hash_a
        FROM img a JOIN img b
          ON a.doc_id % 100 = b.doc_id % 100 AND a.doc_id < b.doc_id
      ),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs)
      SELECT doc_a, doc_b, hamming, hash_a, n_pairs
      FROM pairs CROSS JOIN tot
      ORDER BY hamming, doc_a, doc_b
      LIMIT 100
    """))

  val all: Seq[QuerySpec] =
    Seq(multimodal, frameSample, imageDecode, audioDecode, videoDecode,
      pngDecode, gifDecode, jpegDecode, jpegTranscode, mediaDispatch,
      mp4Demux, mp3Frames, bmpDecode, imageHash)
}
