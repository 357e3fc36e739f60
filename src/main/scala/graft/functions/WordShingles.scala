package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** n-word shingles (space-joined runs of n adjacent tokens) as a native
  * codegen'd Expression — the fused replacement for
  * `transform(sequence(1, size-n+1), i => array_join(slice(toks,i,n), " "))`,
  * whose transform lambda Catalyst evaluates interpreted per shingle.
  * Fewer than n tokens → empty array (not null), matching the composed
  * form's `when(...).otherwise(array())` so callers can treat the result
  * set-wise. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle width must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles needs array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val count = tokens.numElements()
    if (count < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count - n + 1)
    var i = 0
    while (i <= count - n) {
      // null tokens are skipped together with their separator — exactly
      // array_join's null handling, so the composed-form equivalence
      // holds even for null-bearing arrays fed via the SQL surface
      // (Tokenize output itself never contains nulls)
      val sb = new java.lang.StringBuilder()
      var j = 0
      var wrote = false
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        if (t != null) {
          if (wrote) sb.append(' ')
          sb.append(t.toString)
          wrote = true
        }
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def word_shingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.toCol(
      WordShingles(org.apache.spark.sql.graftbridge.Bridge.toExpr(c), n))
}
