package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the custom expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the Column
  * API.
  *
  * Two entry points:
  *  - [[GraftFunctions.registerAll]] on a live session (tests, notebooks);
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    at session build time (spark-submit / cluster config) — the standard
  *    extension-library integration point.
  */
object GraftFunctions {

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> {
      case Seq(a, b) => CosineSim(a, b)
      case args => throw new IllegalArgumentException(
        s"cosine_sim expects 2 arguments, got ${args.length}")
    },
    "rolling_hash" -> {
      case Seq(c) => RollingHash(c, 31L, 1000000007L)
      case args => throw new IllegalArgumentException(
        s"rolling_hash expects 1 argument, got ${args.length}")
    },
    "simhash64" -> {
      case Seq(c) => SimHash64(c)
      case args => throw new IllegalArgumentException(
        s"simhash64 expects 1 argument, got ${args.length}")
    },
    "tokenize" -> {
      case Seq(c) => Tokenize(c)
      case args => throw new IllegalArgumentException(
        s"tokenize expects 1 argument, got ${args.length}")
    },
    "jaro_winkler" -> {
      case Seq(a, b) => JaroWinkler(a, b)
      case args => throw new IllegalArgumentException(
        s"jaro_winkler expects 2 arguments, got ${args.length}")
    },
    "z_value" -> {
      case Seq(a, b) => ZValue(a, b)
      case args => throw new IllegalArgumentException(
        s"z_value expects 2 arguments, got ${args.length}")
    },
    "cms_estimate" -> {
      case Seq(sk, it) => CmsEstimate(sk, it)
      case args => throw new IllegalArgumentException(
        s"cms_estimate expects 2 arguments, got ${args.length}")
    },
    "nfc_normalize" -> {
      case Seq(c) => NfcNormalize(c)
      case args => throw new IllegalArgumentException(
        s"nfc_normalize expects 1 argument, got ${args.length}")
    },
    "damerau_levenshtein" -> {
      case Seq(a, b) => DamerauLevenshtein(a, b)
      case args => throw new IllegalArgumentException(
        s"damerau_levenshtein expects 2 arguments, got ${args.length}")
    },
    "multi_pattern_count" -> {
      case Seq(c, rest @ _*) if rest.nonEmpty && rest.forall(a =>
            a.foldable && a.eval() != null) =>
        MultiPatternCount(c, rest.map(_.eval().toString))
      case args => throw new IllegalArgumentException(
        "multi_pattern_count expects (text, non-null string literal " +
          s"patterns...), got ${args.length} args")
    },
    "word_shingles" -> {
      case Seq(c, n) if n.foldable && (n.eval() match {
            case _: Number => true
            case _ => false
          }) =>
        WordShingles(c, n.eval().asInstanceOf[Number].intValue())
      case args => throw new IllegalArgumentException(
        s"word_shingles expects (column, non-null integer literal n), " +
          s"got ${args.length} args")
    })

  /** Register on a live session's function registry. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }

  /** Call-surface caveats surfaced through `DESCRIBE FUNCTION` — the one
    * place a SQL user sees semantics the type signature can't carry. */
  private val usageDocs: Map[String, String] = Map(
    "jaro_winkler" ->
      ("jaro_winkler(a, b) - Jaro-Winkler similarity of two strings, " +
        "computed over UTF-8 BYTES: exact for ASCII; multi-byte codepoints " +
        "are matched byte-wise, so non-ASCII input gets byte-level (not " +
        "codepoint-level) similarity."))

  /** Builders shaped for SparkSessionExtensions.injectFunction. */
  private[functions] def injectable
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, builder) =>
      val info = usageDocs.get(name) match {
        case Some(usage) =>
          new ExpressionInfo("graft.functions", null, name, usage, "")
        case None => new ExpressionInfo("graft.functions", name)
      }
      (FunctionIdentifier(name), info, builder)
    }
}

/** `spark.sql.extensions`-compatible installer: the SQL function surface
  * plus the optimizer rules (currently [[graft.plans.LevenshteinPruning]]
  * — the length-bound prefilter for thresholded fuzzy matching). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injectable.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPruning)
  }
}
