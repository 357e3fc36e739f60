package graft.queries

import graft.{SparkSpec, Tables}
import scala.math.BigDecimal.RoundingMode

/** Independent recomputation of the LM fluency score: a driver-side Scala
  * fold over the same corpus must reproduce q_lm_score bit-for-bit —
  * tokenization, bigram LM counts, the DECIMAL(38,18) summation and the
  * final round(9) all mirrored outside Spark. */
class TextScoreSpec extends SparkSpec {

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("\\W+").filter(_.nonEmpty)

  test("q_lm_score equals a driver-side recompute of the bigram LM score") {
    val docs = Tables.documents(spark, Sf001)
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val bigrams: Map[Long, Seq[String]] = docs.map { case (id, t) =>
      id -> toks(t).sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }.toMap
    val cnt = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = cnt.toSeq.groupBy(_._1.split(" ", 2)(0))
      .view.mapValues(_.map(_._2).sum).toMap
    val expected = docs.map { case (id, _) =>
      val bgs = bigrams(id)
      if (bgs.isEmpty) (id, 0L, 0.0, 0.0)
      else {
        val ps = bgs.map(bg => cnt(bg).toDouble / c1(bg.split(" ", 2)(0)).toDouble)
        // mirror the plan: each p cast to DECIMAL(38,18) (half-up), summed
        // exactly, cast to double, divided, rounded half-up to 9
        val psum = ps.map(p => BigDecimal(p).setScale(18, RoundingMode.HALF_UP)).sum
        val mean = BigDecimal(psum.toDouble / bgs.size)
          .setScale(9, RoundingMode.HALF_UP).toDouble
        (id, bgs.size.toLong, mean, ps.min)
      }
    }.sortBy(_._1).toSeq
    val got = TextQueries.lmScore.run(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }

  test("q_lm_score probabilities are sane: 0 < min_p <= mean_p <= 1 when scored") {
    val rows = TextQueries.lmScore.run(spark, Sf001).collect()
    rows.filter(_.getLong(1) > 0).foreach { r =>
      val (mean, min) = (r.getDouble(2), r.getDouble(3))
      assert(min > 0.0 && min <= mean && mean <= 1.0, r.toString)
    }
    rows.filter(_.getLong(1) == 0).foreach { r =>
      assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0, r.toString)
    }
  }

  test("char entropy: closed-form values, case folding, and signal ordering") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "aaaaaaaa"),         // one symbol → 0 bits
      (2L, "abababab"),         // two equiprobable symbols → exactly 1 bit
      (3L, "AbAbAbAb"),         // case-folds to doc 2 → identical entropy
      (4L, "abcd0123"),         // eight distinct → exactly 3 bits
      (5L, ""),                 // empty → defined 0.0
      (6L, "the quick brown fox jumps over the lazy dog"),
      (7L, "!@#$%^&*")          // all-"other": one pooled bucket → 0 bits
    ).toDF("doc_id", "text")
    val e = docs.select(col("doc_id"),
        graft.ops.Text.charEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(e(1) === 0.0)
    assert(math.abs(e(2) - 1.0) < 1e-12)
    assert(e(3) === e(2))
    assert(math.abs(e(4) - 3.0) < 1e-12)
    assert(e(5) === 0.0)
    assert(e(7) === 0.0) // pooled "other" bucket is ONE symbol to this signal
    // ordering: repeated < prose < max-diversity for same-alphabet text
    assert(e(1) < e(2) && e(2) < e(6))
  }

  test("rrf fusion: scores recompute from the emitted ranks; both legs contribute") {
    val rows = TextQueries.rrfFusion.run(spark, Sf001).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (ra, rb) = (r.getAs[Int]("ra"), r.getAs[Int]("rb"))
      assert(ra >= 0 && ra <= 20 && rb >= 0 && rb <= 20)
      assert(ra > 0 || rb > 0, "a fused doc must appear in some ranking")
      val want = (if (ra > 0) 1.0 / (ra + 60) else 0.0) +
        (if (rb > 0) 1.0 / (rb + 60) else 0.0)
      assert(r.getAs[Double]("rrf") === want)
    }
    // fused order is non-increasing
    val scores = rows.map(_.getAs[Double]("rrf")).toSeq
    assert(scores === scores.sorted.reverse)
    // a doc present in BOTH rankings beats rank-1-single-leg docs only if
    // the formula says so — sanity: the top fused score is at least the
    // best single-leg score 1/61
    assert(scores.head >= 1.0 / 61)
  }
}
