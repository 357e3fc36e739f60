package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks (SURVEY §2b E4 + the training-data-pipeline
  * surface: tokenization, shingling, language-ID, quality scoring,
  * fingerprinting). Pure column expressions — everything stays inside
  * codegen; nothing crosses a UDF boundary.
  */
object Text {

  /** Lowercased word tokens; empty fragments from leading/trailing
    * delimiters are dropped (so "a b." and "a b" tokenize identically).
    * Backed by the codegen'd [[graft.functions.Tokenize]] Expression —
    * byte-identical to `filter(split(lower(text), "\\W+"), _ =!= "")`,
    * whose filter lambda Catalyst evaluates interpreted (the dedup hot
    * path's dominant cost; ExpressionProps proves the equivalence). */
  def tokens(text: Column): Column =
    graft.functions.Tokenize.tokenize(text)

  /** n-word shingles joined with a single space; fewer than n tokens →
    * empty array (not null — callers can treat it set-wise). Backed by
    * the codegen'd [[graft.functions.WordShingles]]; coalesce keeps the
    * composed form's null-tokens → empty-array behavior. */
  def shingles(toks: Column, n: Int): Column =
    coalesce(
      graft.functions.WordShingles.word_shingles(toks, n),
      array().cast("array<string>"))

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation marks — the regex stand-in for a real BPE vocab. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Ratio of two counts as an exact double (numerator/denominator are
    * integers, so the division is bit-identical in any engine). A zero
    * denominator is defined as 0.0 (an empty doc has a zero ratio); a
    * NULL input NULL-propagates — a MISSING doc has no ratio, and
    * fabricating 0.0 there would score it as pristine text (the hollow
    * DegenGate corpus caught exactly that). */
  def ratio(num: Column, den: Column): Column =
    when(den === 0, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))

  /** Marker-word hit count for one language — the n-gram-heuristic
    * language-ID primitive. Counts token OCCURRENCES (not distinct). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Tiny marker lexicons for the language-ID heuristic (stopwords with
    * high coverage and low cross-language collision). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "los", "las", "una", "es", "y"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "zai"))

  /** Winner-take-all language guess over the marker-hit columns; ties go to
    * the earlier entry in LangMarkers (deterministic, mirrored in SQL). */
  def langGuess(hitCols: Seq[(String, Column)]): Column = {
    val best = hitCols.map(_._2).reduce((a, b) => greatest(a, b))
    val cases = hitCols.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (lang, c)) => acc.when(c === best, lit(lang))
    }
    cases.otherwise(lit("und"))
  }

  /** Order-insensitive bag-of-words fingerprint: md5 of the sorted distinct
    * token list. Stable across engines (binary string sort + md5). */
  def bagFingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  /** The fixed alphabet [[charEntropy]] counts over (lowercased input):
    * letters, digits, space; everything else pools into one "other"
    * bucket. A FIXED alphabet is what makes the histogram a pure column
    * expression — 37 length-difference counts, no explode, no shuffle —
    * and what lets an independent SQL engine replay it verbatim. */
  val EntropyAlphabet: Seq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(_.toString) :+ " "

  /** Character-level Shannon entropy (bits/char) — the randomness/
    * repetitiveness curation signal (low: templated or repeated text;
    * high: encoded blobs, dense IDs). Computed from EXACT integer
    * counts: per-alphabet-char count = len − len(replace(char, '')),
    * the remainder pools as "other"; H = −Σ (c/n)·log2(c/n) with terms
    * added in the fixed alphabet order, so any engine that mirrors the
    * expression (see [[charEntropySql]]) reproduces the double to the
    * last ulp modulo its log2 — callers round to 6 decimals at the
    * compare boundary. Empty input → 0.0. */
  def charEntropy(text: Column): Column = {
    val low = lower(text)
    val n = length(low).cast("double")
    val counts = EntropyAlphabet.map { ch =>
      (length(low) - length(translate(low, ch, ""))).cast("double")
    }
    val other = length(low).cast("double") - counts.reduce(_ + _)
    val terms = (counts :+ other).map { c =>
      when(c > 0, -(c / n) * log2(c / n)).otherwise(lit(0.0))
    }
    when(length(low) > 0, terms.reduce(_ + _)).otherwise(lit(0.0))
  }

  /** The DuckDB replay of [[charEntropy]] over the given input
    * expression, term-for-term in the same order (left-associated
    * additions), so the two engines' doubles agree modulo log2's last
    * ulp. */
  def charEntropySql(inExpr: String): String = {
    val low = s"lower($inExpr)"
    val counts = EntropyAlphabet.map {
      case " " => s"(length($low) - length(replace($low, ' ', '')))"
      case ch => s"(length($low) - length(replace($low, '$ch', '')))"
    }
    val other = s"(length($low) - (${counts.mkString(" + ")}))"
    def p(c: String) = s"(CAST($c AS DOUBLE) / CAST(length($low) AS DOUBLE))"
    val terms = (counts :+ other).map { c =>
      s"CASE WHEN $c > 0 THEN -${p(c)} * log2(${p(c)}) ELSE 0.0 END"
    }
    s"CASE WHEN length($low) > 0 THEN ${terms.mkString(" + ")} ELSE 0.0 END"
  }
}
