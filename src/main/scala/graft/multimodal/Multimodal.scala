package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed per-media features produced by the decode stage. */
final case class MediaFeatures(
    doc_id: Long,
    kind: String,
    n_bytes: Int,
    payload_fp: Long,
    fake_width: Int)

/** One sampled frame emitted by the frame-sample stage. */
final case class SampledFrame(
    doc_id: Long,
    frame_idx: Int,
    n_bytes: Int,
    frame_fp: Long)

/** Typed features decoded from a real image payload. */
final case class ImageFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    mean_r: Double,
    mean_g: Double,
    mean_b: Double)

/** Multimodal-column plumbing (SURVEY §2b E6 / training-pipeline surface):
  * media as opaque `binary` payloads + typed metadata, with decode /
  * feature-extraction running batch-wise on executors via `mapPartitions`
  * over a typed Dataset — the Scala-native equivalent of a Pandas-UDF
  * decode stage.
  *
  * The image path is REAL for the one format a bare JVM can parse without
  * codec libraries: binary PPM (P6, the uncompressed Netpbm format) —
  * [[Multimodal.parsePpm]] / [[Multimodal.encodePpm]] /
  * [[Multimodal.resizePpm]] do actual byte-format work (header grammar
  * with comments, exact pixel-plane length, channel-interleaved RGB,
  * nearest-neighbor downsample that re-emits a valid P6). Compressed
  * formats (JPEG/PNG/audio/video) remain deterministic stubs in
  * [[Multimodal.decodeFeatures]] — no codecs exist in this container —
  * but swapping one in changes only that function body: the binary column
  * schema, partition-parallel batch iteration, and typed Encoder output
  * are the same plumbing the PPM path already exercises end-to-end.
  *
  * Scale: payloads never pass through the driver; a partition processes its
  * media in a streaming iterator (no per-partition materialization), so
  * executor memory bounds batch size, and binary columns ride Parquet's
  * byte-array encoding with the rest of the row.
  */
object Multimodal {

  /** Stand-in corpus: pack documents as (binary payload, kind, metadata) —
    * the shape an image/audio table would have. */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      map(
        lit("lang"), col("lang"),
        lit("source"), col("source")).as("meta"))

  /** Rabin–Karp fingerprint of a byte payload (the stub "content hash"
    * shared by decode and frame-sample; DuckDB recomputes it via
    * list_reduce over ascii codes on the ASCII corpus). */
  private[multimodal] def byteFp(bytes: Array[Byte], from: Int, until: Int): Long = {
    var fp = 0L
    var i = from
    while (i < until) {
      fp = (fp * 31 + (bytes(i) & 0xFF)) % 1000000007L
      i += 1
    }
    fp
  }

  /** Parsed P6 header: dimensions, sample ceiling, and where the
    * channel-interleaved RGB plane starts in the payload. */
  final case class PpmHeader(width: Int, height: Int, maxVal: Int,
      pixelStart: Int)

  /** Parse a binary-PPM (P6) header — a REAL byte-format parse: magic,
    * `#` comments anywhere whitespace is allowed, decimal width / height /
    * maxval, the single whitespace byte that terminates the header, and
    * the requirement that the payload length EXACTLY covers the 3·w·h
    * sample plane (8-bit samples only). The exact-length rule is also the
    * false-positive guard: arbitrary text starting with "P6" never
    * carries a byte-exact pixel plane, so non-image payloads fall through
    * to the stub path instead of mis-decoding. */
  private[graft] def parsePpm(bytes: Array[Byte]): Option[PpmHeader] = {
    var i = 0
    def skipWs(): Unit = {
      var going = true
      while (going && i < bytes.length) {
        val b = bytes(i)
        if (b == ' ' || b == '\n' || b == '\r' || b == '\t') i += 1
        else if (b == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else going = false
      }
    }
    def int(): Option[Int] = {
      skipWs()
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' &&
          v <= Int.MaxValue) {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      if (i == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    i = 2
    for {
      w <- int()
      h <- int()
      mx <- int()
      if w >= 1 && h >= 1 && mx >= 1 && mx <= 255
      // exactly ONE whitespace byte after maxval, then the pixel plane
      if i < bytes.length &&
        (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\r' ||
          bytes(i) == '\t')
      if bytes.length - (i + 1) == 3L * w * h
    } yield PpmHeader(w, h, mx, i + 1)
  }

  /** Emit a valid binary PPM (P6) payload from a channel-interleaved RGB
    * plane. */
  private[graft] def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1 && rgb.length == 3 * w * h,
      s"pixel plane must be exactly 3*$w*$h bytes, got ${rgb.length}")
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode stage: binary payload → typed features, executor-side. For a
    * structurally complete P6 payload the width is the REAL parsed image
    * width; anything else (the text corpus, compressed formats) takes the
    * deterministic stub width, keeping this function total. */
  def decodeFeatures(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed
      .select(col("doc_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          val width = parsePpm(bytes) match {
            case Some(h) => h.width
            // --- deterministic fake decode for non-PPM payloads ---
            case None => (if (bytes.nonEmpty) bytes(0) & 0xFF else 0) % 64 + 1
          }
          MediaFeatures(id, kind, bytes.length, byteFp(bytes, 0, bytes.length), width)
        }
      }
      .toDF()
  }

  /** Real image decode over (doc_id, payload) rows: parse P6, accumulate
    * exact integer channel sums, emit per-channel means — one output row
    * per DECODABLE payload (undecodable rows drop; callers that need
    * error rows anti-join against the input). */
  def decodeImages(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          parsePpm(bytes).map { hd =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var i = hd.pixelStart
            while (i < bytes.length) {
              sr += bytes(i) & 0xFF
              sg += bytes(i + 1) & 0xFF
              sb += bytes(i + 2) & 0xFF
              i += 3
            }
            val n = hd.width.toLong * hd.height
            ImageFeatures(id, hd.width, hd.height,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          }
        }
      }
      .toDF()
  }

  /** Real nearest-neighbor downsample of P6 payloads by an integer
    * factor: output pixel (x, y) is input pixel (x·f, y·f), dims
    * ⌈w/f⌉ × ⌈h/f⌉, re-emitted as a valid P6 payload (decode →
    * transform → re-encode, the actual image-pipeline shape).
    * Undecodable payloads drop. */
  def resizePpm(spark: SparkSession, packed: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, s"resize factor must be positive, got $factor")
    import spark.implicits._
    packed
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          parsePpm(bytes).map { hd =>
            val ow = (hd.width + factor - 1) / factor
            val oh = (hd.height + factor - 1) / factor
            val out = new Array[Byte](3 * ow * oh)
            var y = 0
            while (y < oh) {
              var x = 0
              while (x < ow) {
                val src = hd.pixelStart +
                  3 * (y.toLong * factor * hd.width + x.toLong * factor).toInt
                val dst = 3 * (y * ow + x)
                out(dst) = bytes(src)
                out(dst + 1) = bytes(src + 1)
                out(dst + 2) = bytes(src + 2)
                x += 1
              }
              y += 1
            }
            (id, encodePpm(ow, oh, out))
          }
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Resize stage: binary → binary, executor-side (a real image resize
    * changes only the body — the stub keeps every `factor`-th byte, the
    * degenerate nearest-neighbor downsample). Demonstrates that media
    * transforms compose relationally: payload in, payload out, metadata
    * updated, no driver round-trip. */
  def resizePayload(spark: SparkSession, packed: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, s"resize factor must be positive, got $factor")
    import spark.implicits._
    packed
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          (id, out, bytes.length, out.length)
        }
      }
      .toDF("doc_id", "payload", "orig_bytes", "resized_bytes")
  }

  /** Frame-sample stage (the video path): payload → fixed-size frames →
    * keep every `every`-th full frame, ONE OUTPUT ROW PER FRAME (flatMap —
    * the UDTF shape). Frames never materialize as a whole-video array;
    * the iterator streams, so executor memory bounds one payload, not a
    * partition of exploded frames. */
  def sampleFrames(spark: SparkSession, packed: DataFrame,
      frameBytes: Int, every: Int): DataFrame = {
    require(frameBytes > 0 && every > 0,
      s"frameBytes/every must be positive, got $frameBytes/$every")
    import spark.implicits._
    packed
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = bytes.length / frameBytes // full frames only
        Iterator.range(0, nFrames).filter(_ % every == 0).map { f =>
          SampledFrame(id, f, frameBytes,
            byteFp(bytes, f * frameBytes, (f + 1) * frameBytes))
        }
      }
      .toDF()
  }
}
