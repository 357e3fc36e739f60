package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of the low 16 bits of two longs — [[ZValue]]'s
  * stronger sibling for multi-dimensional clustering: the Hilbert curve
  * visits grid cells so that CONSECUTIVE indices are always
  * Manhattan-distance-1 neighbors (Z-order's worst-case jump spans half
  * the grid at every power-of-two seam), which is why lakehouse engines
  * that offer both (Delta clustering, Iceberg) document Hilbert as the
  * better file-skipping order for range predicates on either dimension.
  *
  * Same 16-bit-per-dimension contract as [[ZValue]]: the key ranks
  * file-grain locality, so production dictionary-codes each dimension to
  * its rank first; the index fits in 32 bits.
  *
  * Codegen'd (preference (b) in SURVEY §4): one static call inlining
  * into whole-stage codegen. The kernel is the classic Warren/Wikipedia
  * xy→d walk — 16 rounds of flip-and-swap rotation, integers only, so a
  * SQL oracle can replay it exactly as a fold (see q_hilbert_order).
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs two bigint columns, got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertIndex.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** d = position of cell (low16(a), low16(b)) along the order-16
    * Hilbert curve. Per round at scale s (high bit first): quadrant
    * bits rx/ry contribute s²·(3rx ⊕ ry) to d, then the subgrid is
    * rotated into canonical orientation (flip both axes when rx=1∧ry=0,
    * then swap axes whenever ry=0). */
  def compute(a: Long, b: Long): Long = {
    var x = a & 0xFFFFL
    var y = b & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk d→(x, y) — not exposed as an expression; used by the
    * spec to prove the bijection + unit-step locality invariant. */
  def inverse(d: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d
    var s = 1L
    while (s < (1L << 16)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column API: `hilbert_index(a, b)` over two bigint columns. */
  def hilbert_index(a: Column, b: Column): Column =
    Bridge.toCol(HilbertIndex(Bridge.toExpr(a), Bridge.toExpr(b)))
}
