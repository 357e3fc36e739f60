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

/** Multimodal-column plumbing (SURVEY §2b E6 / training-pipeline surface):
  * media as opaque `binary` payloads + typed metadata, with decode /
  * feature-extraction running batch-wise on executors via `mapPartitions`
  * over a typed Dataset — the Scala-native equivalent of a Pandas-UDF
  * decode stage.
  *
  * STUB NOTE: no image/audio codecs exist in this container, so
  * `decodeFeatures`' per-payload step is a clearly-marked deterministic
  * fake (byte length + Rabin–Karp fingerprint + a header-derived "width").
  * Everything AROUND the stub is real and load-bearing: binary column
  * schema, partition-parallel batch iteration, typed Encoder output —
  * swapping in a real JPEG decode changes only the function body.
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

  /** Decode stage: binary payload → typed features, executor-side. */
  def decodeFeatures(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed
      .select(col("doc_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          // --- deterministic fake decode (see STUB NOTE above) ---
          val width = (if (bytes.nonEmpty) bytes(0) & 0xFF else 0) % 64 + 1
          MediaFeatures(id, kind, bytes.length, byteFp(bytes, 0, bytes.length), width)
        }
      }
      .toDF()
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
