package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-local naive BPE with the SAME contract (overlapping pair
    * counts, greedy non-overlapping merge, ties to greatest (l, r)) —
    * the independent ground truth the distributed loop must match. */
  private def naiveBpe(texts: Seq[String], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector, ws.size.toLong)
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      if (counts.nonEmpty) {
        val ((l, r), freq) = counts.maxBy { case ((l, r), f) => (f, l, r) }
        out += ((step, l, r, freq))
        words = words.groupBy { case (syms, _) => mergeOne(syms, l, r) }
          .map { case (m, ws) => (m, ws.values.sum) }
      }
    }
    out.toSeq
  }

  private def mergeOne(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("bpe_merge kernel: greedy left-to-right, non-overlapping") {
    val df = Seq(
      (Seq("a", "a", "a"), "a", "a"),
      (Seq("a", "a", "a", "a"), "a", "a"),
      (Seq("x", "a", "b", "y", "a", "b"), "a", "b"),
      (Seq("a"), "a", "a"),
      (Seq.empty[String], "a", "a"))
      .toDF("syms", "l", "r")
    val got = df.select(
      graft.functions.BpeMerge.bpe_merge(col("syms"), col("l"), col("r")))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(
      Seq("aa", "a"), Seq("aa", "aa"), Seq("x", "ab", "y", "ab"),
      Seq("a"), Seq.empty))
  }

  test("train matches the driver-local reference on a random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("spark", "scala", "stream", "batch", "merge", "apple",
      "banana", "a", "bb", "shuffle")
    val texts = (1 to 80).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val want = naiveBpe(texts, nMerges = 6)
    val got = Bpe.train(texts.toDF("text"), "text", nMerges = 6)
      .orderBy("step")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === want)
  }

  test("encode matches a naive re-merge of every document") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("spark", "scala", "stream", "batch", "merge", "a", "bb")
    val texts = (1 to 40).map(_ =>
      (1 to (1 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = naiveBpe(texts, nMerges = 5).map { case (_, l, r, _) => (l, r) }
    val want = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      val toks = ws.map { w =>
        merges.foldLeft(w.map(_.toString).toVector) {
          case (syms, (l, r)) => mergeOne(syms, l, r)
        }.length.toLong
      }
      (i.toLong, ws.length.toLong, toks.sum, ws.map(_.length.toLong).sum)
    }
    val got = Bpe.encode(docs, "doc_id", "text", nMerges = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_tokens", "n_chars")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("train stops early when no adjacent pairs remain") {
    // single-char words only → after 0 possible merges... actually one
    // pair ("a","a") exists in "aa"; after merging it the table is all
    // single-symbol words and the loop must stop at 1 row, not 4
    val got = Bpe.train(Seq("aa b c", "aa").toDF("text"), "text", nMerges = 4)
      .orderBy("step")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "a", 2L)))
  }
}
