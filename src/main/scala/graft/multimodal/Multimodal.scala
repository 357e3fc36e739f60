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

  /** Decode stage: binary payload → typed features, executor-side. */
  def decodeFeatures(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed
      .select(col("doc_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          // --- deterministic fake decode (see STUB NOTE above) ---
          var fp = 0L
          var i = 0
          while (i < bytes.length) {
            fp = (fp * 31 + (bytes(i) & 0xFF)) % 1000000007L
            i += 1
          }
          val width = (if (bytes.nonEmpty) bytes(0) & 0xFF else 0) % 64 + 1
          MediaFeatures(id, kind, bytes.length, fp, width)
        }
      }
      .toDF()
  }
}
