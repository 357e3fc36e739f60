package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lowercased word tokenization as ONE native codegen'd Expression.
  *
  * Semantics are byte-identical to the composed form it replaces —
  * `filter(split(lower(text), "\\W+"), t => t =!= "")` — same Java regex
  * engine, same UTF8String.toLowerCase, same empty-fragment drop. The
  * composed form's `filter` is a higher-order function that Catalyst
  * EVALUATES INTERPRETED (lambda per element, boxed); on the dedup hot
  * path that interpretation was the dominant cost (SURVEY §8 measured the
  * shingle pipeline at ~11 s/sf0.1 when re-evaluated). This expression
  * stays inside whole-stage codegen as a single static call.
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"tokenize needs a string column, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Tokenize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Tokenize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokenize {
  private val NonWord = Pattern.compile("\\W+")

  def compute(text: UTF8String): ArrayData = {
    // -1 limit keeps leading empties exactly like Spark's split(), which
    // the non-empty filter then drops — preserving the composed form's
    // output for strings that start with a delimiter.
    val parts = NonWord.split(text.toLowerCase.toString, -1)
    val out = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) out.add(UTF8String.fromString(parts(i)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def tokenize(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.toCol(
      Tokenize(org.apache.spark.sql.graftbridge.Bridge.toExpr(c)))
}
