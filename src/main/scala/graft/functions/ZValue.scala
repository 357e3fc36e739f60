package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of the low 16 bits of two longs — the
  * multi-dimensional clustering key behind data-skipping layouts (Delta
  * OPTIMIZE ZORDER, Iceberg sort orders): sorting by z-value keeps rows
  * close in BOTH dimensions close on disk, so per-file min/max ranges
  * shrink on each dimension and a predicate on either column prunes files.
  *
  * 16 bits per dimension (the z fits in 32) matches the data-skipping use:
  * the key ranks file-grain locality, so dictionary-coding each dimension
  * to its rank first (as production z-order does) loses nothing. Engines
  * wanting more range interleave the rank, not the raw key.
  *
  * Codegen'd (preference (b) in SURVEY §4): the bit-twiddle inlines into
  * whole-stage codegen. The interleave itself is the constant-time
  * shift-mask ladder, not a 16-step loop.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"z_value needs two bigint columns, got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZValue.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZValue.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {

  /** Spread the low 16 bits of x to the even bit positions of a 32-bit
    * word (the standard Morton shift-mask ladder). */
  private def spread(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** z = interleave(low16(a) → even bits, low16(b) → odd bits). */
  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column API: `z_value(a, b)` over two bigint columns. */
  def z_value(a: Column, b: Column): Column =
    Bridge.toCol(ZValue(Bridge.toExpr(a), Bridge.toExpr(b)))
}
