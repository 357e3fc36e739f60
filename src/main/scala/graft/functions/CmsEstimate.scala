package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DataTypes, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency estimate from a serialized Count-Min sketch — the probe
  * side Spark never shipped: the builtin `count_min_sketch` AGGREGATE
  * produces the binary sketch (mergeable, map-side-combinable — the 100 TB
  * heavy-hitter shape), but reading an estimate back out is driver-only
  * Java API. This expression closes the loop in-plan: broadcast the one
  * sketch row against a bounded probe set and estimate per key, so the
  * corpus is touched exactly once and the probe stage is broadcast-sized.
  *
  * Item hashing mirrors Spark's CountMinSketchAgg update path exactly
  * (integral types via addLong/estimateCount(long), strings via their
  * UTF-8 bytes) — an estimate is only meaningful against a sketch built by
  * the same hashing.
  *
  * CMS guarantee (Cormode–Muthukrishnan): estimate ≥ true count always;
  * estimate ≤ true + eps·N with probability ≥ confidence per probe. The
  * gate pins both (the upper arm with generous slack, since the seed is
  * fixed and the bound is probabilistic).
  *
  * Deserializing the sketch per row would swamp the probe stage, so a
  * per-thread single-entry cache keyed on the byte array keeps the common
  * plan (ONE broadcast sketch, many probes) at one deserialization per
  * task thread. Codegen emits a static call like the package's other
  * kernels.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs a binary sketch column, got ${left.dataType}")
    else right.dataType match {
      case LongType | DataTypes.IntegerType | DataTypes.ShortType |
          DataTypes.ByteType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate supports integral or string probe keys, got $other")
    }

  override def nullSafeEval(sketch: Any, item: Any): Any = {
    val cms = CmsEstimate.deserialize(sketch.asInstanceOf[Array[Byte]])
    item match {
      case s: UTF8String => cms.estimateCount(s.getBytes)
      case b: java.lang.Byte => cms.estimateCount(b.longValue)
      case sh: java.lang.Short => cms.estimateCount(sh.longValue)
      case i: java.lang.Integer => cms.estimateCount(i.longValue)
      case l: java.lang.Long => cms.estimateCount(l)
      case other => throw new IllegalArgumentException(
        s"cms_estimate: unsupported probe value $other")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    right.dataType match {
      case StringType =>
        nullSafeCodeGen(ctx, ev, (sk, it) => s"""
          ${ev.value} = graft.functions.CmsEstimate.estimateBytes($sk, $it.getBytes());
        """)
      case _ =>
        nullSafeCodeGen(ctx, ev, (sk, it) => s"""
          ${ev.value} = graft.functions.CmsEstimate.estimateLong($sk, (long) $it);
        """)
    }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CmsEstimate {

  /** (bytes-identity, sketch) per thread: one deserialization per task for
    * the broadcast-one-sketch plan, zero synchronization. */
  private val lastSketch =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  private[functions] def deserialize(bytes: Array[Byte]): CountMinSketch = {
    val cached = lastSketch.get()
    if (cached != null && (cached._1 eq bytes)) cached._2
    else {
      val cms = CountMinSketch.readFrom(bytes)
      lastSketch.set((bytes, cms))
      cms
    }
  }

  def estimateLong(sketchBytes: Array[Byte], item: Long): Long =
    deserialize(sketchBytes).estimateCount(item)

  def estimateBytes(sketchBytes: Array[Byte], item: Array[Byte]): Long =
    deserialize(sketchBytes).estimateCount(item)

  /** Column API: `cms_estimate(sketch, item)`. */
  def cms_estimate(sketch: Column, item: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.toCol(
      CmsEstimate(org.apache.spark.sql.graftbridge.Bridge.toExpr(sketch),
        org.apache.spark.sql.graftbridge.Bridge.toExpr(item)))
}
