package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BMP codec round-trips/rejections and the aHash + Hamming-band dedup
  * pair (session-9 additions). */
class BmpHashSpec extends SparkSpec {
  import spark.implicits._

  test("BMP round-trip recovers dims, exact sums, and the TOP row") {
    val rnd = new scala.util.Random(97)
    val images = (1L to 25L).map { id =>
      val w = 1 + rnd.nextInt(13)
      val h = 1 + rnd.nextInt(9)
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      (id, w, h, rgb)
    }
    val packed = images.map { case (id, w, h, rgb) =>
      (id, Multimodal.encodeBmp(w, h, rgb))
    }.toDF("doc_id", "payload")
    val got = Multimodal.decodeBmpImages(spark, packed)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.size === images.size)
    images.foreach { case (id, w, h, rgb) =>
      val r = got(id)
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h)
      def sum(c: Int) = rgb.indices
        .collect { case i if i % 3 == c => (rgb(i) & 0xFF).toLong }.sum
      assert(r.getAs[Long]("sum_r") === sum(0), s"img $id red sum")
      assert(r.getAs[Long]("sum_g") === sum(1))
      assert(r.getAs[Long]("sum_b") === sum(2))
      // image-space top-left pixel survives the bottom-up storage flip
      assert(r.getAs[Int]("top_r") === (rgb(0) & 0xFF), s"img $id top row")
      assert(r.getAs[Int]("top_g") === (rgb(1) & 0xFF))
      assert(r.getAs[Int]("top_b") === (rgb(2) & 0xFF))
    }
  }

  test("BMP parser accepts top-down DIBs and rejects malformed payloads") {
    val rgb = Array.tabulate[Byte](3 * 2 * 2)(i => (i * 7).toByte)
    val good = Multimodal.encodeBmp(2, 2, rgb)
    assert(Multimodal.parseBmp(good).exists(_.bottomUp))
    // flip the stored height sign → a top-down DIB, still valid
    val topDown = good.clone()
    val h = -2
    var j = 0
    while (j < 4) {
      topDown(22 + j) = ((h >> (8 * j)) & 0xFF).toByte; j += 1
    }
    val hd = Multimodal.parseBmp(topDown)
    assert(hd.exists(x => !x.bottomUp && x.height === 2))
    // decode must now read row 0 as the image top row directly
    val feats = Multimodal.decodeBmpImages(spark,
      Seq((1L, topDown)).toDF("doc_id", "payload")).head()
    assert(feats.getAs[Int]("top_b") === (topDown(54) & 0xFF))
    // rejections: wrong magic, truncated plane, lying fileSize, 8 bpp
    assert(Multimodal.parseBmp("not a bmp at all".getBytes) === None)
    assert(Multimodal.parseBmp(good.dropRight(1)) === None)
    val badSize = good.clone(); badSize(2) = (badSize(2) ^ 1).toByte
    assert(Multimodal.parseBmp(badSize) === None)
    val bad8 = good.clone(); bad8(28) = 8
    assert(Multimodal.parseBmp(bad8) === None)
  }

  test("averageHash: block pattern recovered bit-exactly; flat image is 0") {
    val rnd = new scala.util.Random(31)
    // 8x8-cell block images at several cell sizes: hash must equal the
    // generating 60-bit pattern
    (1 to 10).foreach { trial =>
      val pattern = rnd.nextLong() & ((1L << 60) - 1)
      val pop = java.lang.Long.bitCount(pattern)
      if (pop > 0 && pop < 60) {
        val cell = 1 + rnd.nextInt(3)
        val wh = 8 * cell
        val rgb = new Array[Byte](3 * wh * wh)
        for (y <- 0 until wh; x <- 0 until wh) {
          val bit = (pattern >>> ((y / cell) * 8 + x / cell)) & 1L
          val v = if (bit == 1L) 255.toByte else 0.toByte
          val i = 3 * (y * wh + x)
          rgb(i) = v; rgb(i + 1) = v; rgb(i + 2) = v
        }
        val hash = Multimodal.averageHash(spark,
          Seq((1L, Multimodal.encodePpm(wh, wh, rgb)))
            .toDF("doc_id", "payload")).head().getAs[Long]("ahash")
        assert(hash === pattern, s"trial $trial cell $cell")
      }
    }
    // flat image: no cell exceeds the mean strictly → all-zero hash
    val flat = Array.fill[Byte](3 * 8 * 8)(120.toByte)
    val h0 = Multimodal.averageHash(spark,
      Seq((1L, Multimodal.encodePpm(8, 8, flat))).toDF("doc_id", "payload"))
      .head().getAs[Long]("ahash")
    assert(h0 === 0L)
    // sub-grid images drop
    val tiny = Multimodal.averageHash(spark,
      Seq((1L, Multimodal.encodePpm(7, 8, Array.fill[Byte](3 * 56)(1))))
        .toDF("doc_id", "payload"))
    assert(tiny.count() === 0L)
  }

  test("hammingPairs: exhaustive equivalence to brute force at maxHam 3") {
    val rnd = new scala.util.Random(7)
    val hashes = (1L to 60L).map { k =>
      // clustered hashes: 12 base values, each with small perturbations
      val base = rnd.nextInt(12)
      val pat = new scala.util.Random(base).nextLong()
      (k, pat ^ ((1L << rnd.nextInt(3)) - 1))
    }
    val df = hashes.toDF("k", "h")
    val got = graft.ops.Similarity
      .hammingPairs(df, "k", "h", bands = 4, bandBits = 16, maxHam = 3)
      .select("key_a", "key_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === want)
  }

  test("hammingPairs: bucket cap drops mega-bucket candidates only") {
    // 40 identical hashes (one mega bucket in every band) + 2 close ones
    val df = ((1L to 40L).map(k => (k, 0L)) ++
      Seq((100L, 1L << 40), (101L, (1L << 40) | 1L))).toDF("k", "h")
    val got = graft.ops.Similarity
      .hammingPairs(df, "k", "h", bands = 4, bandBits = 16, maxHam = 3,
        maxBucket = 8)
      .collect().map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b")))
    // the 40-identical cluster exceeds every band bucket → dropped;
    // the pair (100, 101) shares three untouched bands → kept
    assert(got.toSet === Set((100L, 101L)))
  }
}
