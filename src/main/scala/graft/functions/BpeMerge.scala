package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step over a symbol array as a native codegen'd
  * Expression: every adjacent (left, right) occurrence collapses to the
  * concatenated symbol, greedy LEFT-TO-RIGHT and non-overlapping — the
  * merge rule every BPE trainer/encoder applies (Sennrich et al. 2016):
  * in `[a,a,a]` merging (a,a) yields `[aa,a]`, never `[a,aa]`, and the
  * middle `a` is consumed by the first match only.
  *
  * This is the training loop's hot kernel — it rewrites the whole word
  * table once per merge round — so it stays inside whole-stage codegen
  * as one static call (an equivalent `aggregate()` HOF fold would run
  * interpreted with per-element boxed lambdas AND quadratic array
  * appends).
  */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"bpe_merge needs (array<string>, string, string), got ($a, $b, $c)")
    }

  override def nullSafeEval(syms: Any, l: Any, r: Any): Any =
    BpeMerge.compute(syms.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l, r) =>
      s"${ev.value} = graft.functions.BpeMerge.compute($s, $l, $r);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object BpeMerge {

  /** Shared kernel for interpreted eval and codegen. */
  def compute(syms: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms.getUTF8String(i).equals(l) &&
          syms.getUTF8String(i + 1).equals(r)) {
        out.add(UTF8String.concat(l, r))
        i += 2
      } else {
        out.add(syms.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def bpe_merge(syms: Column, l: Column, r: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.toCol(
      BpeMerge(
        org.apache.spark.sql.graftbridge.Bridge.toExpr(syms),
        org.apache.spark.sql.graftbridge.Bridge.toExpr(l),
        org.apache.spark.sql.graftbridge.Bridge.toExpr(r)))
}
