package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def packed = Multimodal.packDocuments(
    Seq(
      (1L, "abcdefghij" * 20, "en", "web"), // 200 bytes
      (2L, "xy", "en", "web")) // shorter than one frame
      .toDF("doc_id", "text", "lang", "source"))

  test("resize keeps every factor-th byte and updates byte counts") {
    val r = Multimodal.resizePayload(spark, packed, factor = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getInt(2) === 200 && r(0).getInt(3) === 100)
    val orig = "abcdefghij".getBytes("UTF-8")
    val resized = r(0).getAs[Array[Byte]]("payload")
    assert(resized.take(5).toSeq === Seq(orig(0), orig(2), orig(4), orig(6), orig(8)).toSeq)
    assert(r(1).getInt(3) === 1) // ceil(2/2)
  }

  test("frame sampling keeps every Nth full frame and drops the partial tail") {
    val f = Multimodal.sampleFrames(spark, packed, frameBytes = 64, every = 2)
      .orderBy("doc_id", "frame_idx").collect()
    // doc 1: 200 bytes -> 3 full frames (0,1,2), keep 0 and 2; doc 2: none
    assert(f.map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((1L, 0), (1L, 2)))
    assert(f.forall(_.getInt(2) === 64))
    // fingerprint matches an independent recompute of the same slice
    val bytes = ("abcdefghij" * 20).getBytes("UTF-8")
    val expectFp = bytes.slice(128, 192)
      .foldLeft(0L)((h, b) => (h * 31 + (b & 0xFF)) % 1000000007L)
    assert(f(1).getLong(3) === expectFp)
  }
}
