package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature (Broder 1997, "On the resemblance and containment of
  * documents"): k independent min-hashes of a shingle set, h_i(s) =
  * XXH64(s, seed = i). Returns array<long> of length k.
  *
  * Native Expression, not k higher-order `transform` calls: Catalyst
  * evaluates HOF lambdas interpreted per element, so the column-API
  * formulation pays k interpreted passes (plus k boxed array
  * materializations) per row — measured as the dominant cost of the
  * MinHash-LSH dedup path at sf0.1. This computes all k mins in ONE pass
  * over the shingle array inside whole-stage codegen: each shingle is
  * hashed k times with different seeds, no intermediate arrays, no boxing.
  *
  * Null elements are skipped (same as array_min over a transform that
  * propagates nulls); an all-null or empty input yields Long.MaxValue
  * sentinels (callers filter empty shingle sets before signing — see
  * Dedup.minhashNearDups).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"signature width k=$k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    // primitive-array wrap — no per-element boxing on the hot path
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  def minhash_sig(c: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.toCol(
      MinHashSig(org.apache.spark.sql.graftbridge.Bridge.toExpr(c), k))
}
