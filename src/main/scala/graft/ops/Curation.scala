package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: boilerplate
  * phrase stripping (the CCNet/RefinedWeb common-paragraph removal idea at
  * n-gram grain — the test corpus is single-line, so the repeated unit is
  * the shingle), sliding context-window example generation, and
  * Gopher-style composite quality rules (Rae et al. 2021, table A1).
  *
  * Everything is exact-arithmetic column algebra: integer counts, integer
  * cross-multiplied thresholds (never a float mean), and one IEEE division
  * only in the final reported fraction — the oracle-portability contract
  * the rest of the engine follows.
  */
object Curation {

  /** Per-document boilerplate profile over a pre-shingled corpus.
    *
    * A shingle is "boilerplate" when its corpus document frequency is at
    * least `dfMin` — frequent enough to be template/navigation text rather
    * than content. Output: one row per input doc with its distinct-shingle
    * count, how many of those are boilerplate, and the fraction.
    *
    * Scale shape: the DF aggregation is the standard term-count job (one
    * shuffle on shingle); the boilerplate lexicon is SMALL by definition
    * (high-DF tail of a Zipf curve), so the hit-count join back to the
    * posting list is a broadcast — no second shuffle of the corpus. At
    * 100 TB the lexicon is computed once per snapshot and reused.
    *
    * @param shingled (idCol, shCol: array<string> of DISTINCT shingles)
    */
  def boilerplateProfile(shingled: DataFrame, idCol: String, shCol: String,
      dfMin: Long): DataFrame = {
    val ex = shingled.select(col(idCol), explode(col(shCol)).as("g"))
    // shingles are distinct per doc, so count(*) per shingle IS document
    // frequency — no countDistinct pass needed.
    val lexicon = ex.groupBy("g").agg(count(lit(1)).as("df"))
      .where(col("df") >= dfMin)
      .select("g")
    val hits = ex.join(broadcast(lexicon), "g")
      .groupBy(idCol).agg(count(lit(1)).as("n_boiler"))
    shingled
      .select(col(idCol), size(col(shCol)).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_boiler", coalesce(col("n_boiler"), lit(0L)))
      .withColumn("boiler_frac", Text.ratio(col("n_boiler"), col("n_shingles")))
  }

  /** Sliding token context windows — the (context, next-chunk) example
    * generator of an LM training pipeline. Full windows of `win` tokens at
    * `stride` steps; a document shorter than one window yields a single
    * short window (so no non-empty doc is silently dropped); the tail
    * beyond the last full window is dropped, as in fixed-shape training.
    *
    * Pure per-row explode — embarrassingly parallel, no shuffle at all;
    * output order is imposed by the caller.
    */
  def contextWindows(docs: DataFrame, idCol: String, textCol: String,
      win: Int, stride: Int): DataFrame = {
    require(win > 0 && stride > 0, s"win=$win stride=$stride must be positive")
    docs
      .select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") > 0)
      .withColumn("st",
        explode(
          when(col("n") < win, array(lit(0)))
            .otherwise(sequence(lit(0), col("n") - win, lit(stride)))))
      .select(
        col(idCol),
        // starts are exact multiples of the stride, so the index is a
        // plain integer division — no window function needed.
        (col("st") / stride).cast("long").as("win_idx"),
        col("st").cast("long").as("win_start"),
        slice(col("toks"), col("st") + 1, lit(win)).as("w"))
      .select(
        col(idCol), col("win_idx"), col("win_start"),
        size(col("w")).cast("long").as("win_len"),
        array_join(col("w"), " ").as("win_text"))
  }

  /** Gopher-style quality rules as exact integer predicates. Each rule is
    * a 0/1 flag so downstream mixing can weight or ablate rules
    * independently; `keep` is their conjunction.
    *
    *  - r_wordcount:   minWords <= |tokens| <= maxWords
    *  - r_meanwordlen: mean token length in [3, 10] — evaluated as
    *                   3·wc <= Σlen <= 10·wc (integer cross-multiply,
    *                   no float mean)
    *  - r_stopwords:   at least `minStop` DISTINCT tokens from the
    *                   stopword lexicon (Gopher's "2 of a stop list" rule)
    *  - r_alpha:       at least 80% of tokens purely alphabetic, as
    *                   5·n_alpha >= 4·wc
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int, maxWords: Int, stopwords: Seq[String],
      minStop: Int = 2): DataFrame = {
    def flag(c: Column): Column = when(c, lit(1)).otherwise(lit(0)).cast("int")
    docs
      .select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .withColumn("wc", size(col("toks")).cast("long"))
      .withColumn("n_chars",
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)))
      .withColumn("n_alpha",
        size(filter(col("toks"), t => t.rlike("^[a-z]+$"))).cast("long"))
      .withColumn("n_stop",
        size(array_intersect(
          array_distinct(col("toks")),
          array(stopwords.map(lit): _*))).cast("long"))
      .withColumn("r_wordcount",
        flag(col("wc") >= minWords && col("wc") <= maxWords))
      .withColumn("r_meanwordlen",
        flag(lit(3) * col("wc") <= col("n_chars") &&
          col("n_chars") <= lit(10) * col("wc")))
      .withColumn("r_stopwords", flag(col("n_stop") >= minStop))
      .withColumn("r_alpha", flag(lit(5) * col("n_alpha") >= lit(4) * col("wc")))
      .withColumn("keep",
        col("r_wordcount") * col("r_meanwordlen") *
          col("r_stopwords") * col("r_alpha"))
      .drop("toks")
  }
}
