package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over a token array (Charikar 2002, "Similarity estimation
  * techniques from rounding algorithms"): each token's 64-bit hash votes ±1
  * per bit position; the fingerprint sets the bits with positive tally.
  * Near-duplicate documents land within a small Hamming distance — the
  * scale path groups on fingerprint bands instead of comparing all pairs
  * (SURVEY §2b near-dup surface).
  *
  * Native Expression: the 64-bit tally loop runs inside whole-stage codegen
  * via a static helper — one call per row, zero boxing. Token hash is
  * Spark's XXH64 (seed 42), matching `xxhash64()` for single string args.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 needs array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  final val Seed = 42L

  def compute(tokens: ArrayData): Long = {
    val tally = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash64(c: Column): Column = org.apache.spark.sql.graftbridge.Bridge.toCol(SimHash64(org.apache.spark.sql.graftbridge.Bridge.toExpr(c)))
}
