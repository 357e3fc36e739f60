package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-induction loop every subword tokenizer runs before a model
  * ever trains.
  *
  * Scale shape — the same reason HF/SentencePiece trainers are feasible
  * at all, made distributed: the loop never touches the corpus after the
  * first pass. Round 0 reduces 100 TB of text to the WORD-FREQUENCY
  * table (distinct words × count — map-side-combinable aggregate,
  * bounded by vocabulary not corpus size), and every merge round then
  * runs over that table only: pair counting is a bounded explode
  * (|word|−1 rows per word) into a map-side-combinable integer sum; the
  * argmax is a single-row `max(struct(freq, l, r))` reduce (ONE pair
  * crosses to the driver per round — the only driver traffic in the
  * loop); the merge rewrite is a map-only pass through the codegen'd
  * [[graft.functions.BpeMerge]] kernel. `localCheckpoint` truncates the
  * per-round lineage exactly as in [[Graph.pageRank]].
  *
  * Determinism contract: counts are exact integers, and frequency ties
  * break to the lexicographically GREATEST (l, r) — binary UTF8
  * ordering, identical in any engine (HF breaks ties by insertion
  * order, which only that implementation can replay).
  *
  * Returns the merge table (step, lhs, rhs, freq) — step 1-based, freq
  * the pair count at selection time. Stops early (fewer rows) if the
  * word table runs out of adjacent pairs.
  */
object Bpe {

  /** The shared loop: returns the merge list and the FINAL word table
    * (__w = original word, syms = its post-merge tokenization, __cnt).
    * The word table doubles as the ENCODE dictionary: training already
    * tokenized every distinct corpus word, so encoding is a join — the
    * corpus is never re-merged (see [[encode]]). */
  private def trainCore(docs: DataFrame, textCol: String, nMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(nMerges >= 1, s"nMerges=$nMerges must be at least 1")
    var words = docs
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__cnt"))
      .select(col("__w"),
        transform(sequence(lit(1), length(col("__w"))),
          i => col("__w").substr(i, lit(1))).as("syms"),
        col("__cnt"))
      .transform(graft.ops.Checkpoints.materialize)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("__cnt"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(
              element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("__cnt")).as("freq"))
        .agg(max(struct(col("freq"), col("l"), col("r"))).as("m"))
        .select(col("m.freq"), col("m.l"), col("m.r"))
        .collect()
      if (top.isEmpty || top(0).isNullAt(0)) exhausted = true
      else {
        val (freq, l, r) =
          (top(0).getLong(0), top(0).getString(1), top(0).getString(2))
        merges += ((step, l, r, freq))
        words = words
          .withColumn("syms",
            graft.functions.BpeMerge.bpe_merge(col("syms"), lit(l), lit(r)))
          .transform(graft.ops.Checkpoints.materialize)
        step += 1
      }
    }
    (merges.toSeq, words)
  }

  /** Session-scoped trainer memo: [[train]] and [[encode]] over the SAME
    * corpus/params share one `trainCore` run — the merge loop is the
    * expensive part (nMerges driver-orchestrated rounds), and a bench or
    * pipeline session that both learns the merges and encodes with them
    * was paying it twice. Keyed by the canonicalized input plan (so
    * different corpora/SF dirs never collide) under a weak session key
    * (a stopped session's entries drop with the session). The memoized
    * word table is localCheckpoint-backed, valid for the session's life. */
  private val memo = new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
    scala.collection.concurrent.TrieMap[(String, Int, Int),
      (Seq[(Int, String, String, Long)], DataFrame)]]()

  private def trainMemo(docs: DataFrame, textCol: String, nMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val inner = memo.synchronized {
      memo.computeIfAbsent(docs.sparkSession,
        _ => scala.collection.concurrent.TrieMap.empty)
    }
    val key = (textCol, nMerges,
      docs.queryExecution.analyzed.canonicalized.hashCode())
    inner.getOrElseUpdate(key, trainCore(docs, textCol, nMerges))
  }

  def train(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMemo(docs, textCol, nMerges)._1.toDF("step", "lhs", "rhs", "freq")
  }

  /** BPE ENCODE: per-document subword statistics under the trained
    * merges. The corpus is tokenized by JOINING each word against the
    * trainer's final word table — at 100 TB the dictionary is bounded
    * by vocabulary (broadcastable for natural languages; a plain hash
    * join otherwise) and the corpus streams through once, instead of
    * paying nMerges rewrite passes over every document. Every corpus
    * word is in the dictionary by construction (same corpus trained).
    *
    * Returns (idCol, n_words, n_tokens, n_chars, compression) where
    * compression = chars per token — THE metric tokenizer quality is
    * judged on. One double division over exact ints: engine-portable. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    val (_, words) = trainMemo(docs, textCol, nMerges)
    val dict = words.select(col("__w"), size(col("syms")).cast("long").as("__nt"))
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .join(broadcast(dict), Seq("__w"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("__nt")).as("n_tokens"),
        sum(length(col("__w")).cast("long")).as("n_chars"))
      .withColumn("compression",
        col("n_chars").cast("double") / col("n_tokens").cast("double"))
  }
}
