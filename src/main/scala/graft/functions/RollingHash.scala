package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * `h_i = (h_{i-1} * base + byte_i) mod m` — the classic Rabin–Karp document
  * fingerprint (SURVEY §2b text-analysis surface; the engine's deterministic
  * alternative to murmur-style content hashes, reproducible in any engine —
  * the DuckDB oracle recomputes it with list_reduce over ascii codes, which
  * coincides with bytes for ASCII corpora).
  *
  * A native codegen'd Catalyst Expression (preference order (b) from SURVEY
  * §4): the loop inlines into whole-stage codegen — no UDF serialization
  * wall, no boxing per row.
  */
case class RollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DataTypes.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ctx.freshName per instance: fixed names collide ("Redefinition of
    // local variable") when two RollingHash calls land in one codegen'd
    // function, silently dropping the whole stage to interpreted mode.
    val h = ctx.freshName("h")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c => s"""
      long $h = 0L;
      int $n = $c.numBytes();
      for (int $i = 0; $i < $n; $i++) {
        $h = ($h * ${base}L + (long) ($c.getByte($i) & 0xFF)) % ${mod}L;
      }
      ${ev.value} = $h;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  def compute(s: UTF8String, base: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      h = (h * base + (s.getByte(i) & 0xFF).toLong) % mod
      i += 1
    }
    h
  }

  /** Column API: `rolling_hash(col)` with the conventional base-31 / 1e9+7. */
  def rolling_hash(c: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    org.apache.spark.sql.graftbridge.Bridge.toCol(RollingHash(org.apache.spark.sql.graftbridge.Bridge.toExpr(c), base, mod))
}
