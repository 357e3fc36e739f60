package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UNRESTRICTED Damerau–Levenshtein distance (Lowrance & Wagner 1975) —
  * true edit distance over {insert, delete, substitute, transpose}, the
  * metric that scores "ca" → "abc" as 2 (transpose, then insert) where
  * the restricted OSA variant says 3 and plain Levenshtein says 3.
  * Spark ships only `levenshtein`; record-linkage blocking on names and
  * near-key ids wants the transposition-aware metric (typo corpora:
  * ~80% of human typos are single-char ops INCLUDING swaps — Damerau
  * 1964). This is the full algorithm with the per-alphabet
  * last-occurrence table, NOT the two-row OSA shortcut, so it agrees
  * symbol-for-symbol with DuckDB's damerau_levenshtein — which is what
  * lets the oracle gate it exactly.
  *
  * O(n·m) time, O(n·m) space (the unrestricted form genuinely needs the
  * full matrix — transpositions reach back arbitrarily far). Inputs over
  * 500 chars return null rather than allocate quadratic memory on a
  * hostile row — the multimodal family's reject-don't-wedge discipline.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein needs (string, string), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val out = DamerauLevenshtein.distance(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)
    if (out < 0) null else out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DamerauLevenshtein.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int d = $cls.distance($a.toString(), $b.toString());
      if (d < 0) { ${ev.isNull} = true; } else { ${ev.value} = d; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  final val MaxLen = 500

  /** Lowrance–Wagner; returns −1 when either input exceeds [[MaxLen]]. */
  def distance(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    if (n > MaxLen || m > MaxLen) return -1
    if (n == 0) return m
    if (m == 0) return n
    val maxdist = n + m
    // d is (n+2) x (m+2), offset by 2: d(i+1)(j+1) is the classic d[i][j]
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = maxdist
    var i = 0
    while (i <= n) { d((i + 1) * w) = maxdist; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = maxdist; d(w + j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Char, Int]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da.getOrDefault(b.charAt(j - 1), 0)
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost            // d[i-1][j-1] + cost
        val ins = d((i + 1) * w + j) + 1         // d[i][j-1] + 1
        val del = d(i * w + j + 1) + 1           // d[i-1][j] + 1
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (tra < best) best = tra
        d((i + 1) * w + (j + 1)) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d((n + 1) * w + (m + 1))
  }
}
