package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling polynomial document
  * fingerprint: fold over codepoints of `acc = (acc*31 + cp) mod m`.
  *
  * This is the one scalar operator where composing built-ins is genuinely
  * inadequate (SURVEY.md §2.9): the `aggregate(split(text,''))` formulation
  * allocates a per-character array and runs the lambda interpreted. This
  * expression participates in whole-stage codegen (`doGenCode` emits a
  * static call — no boxing, no array), with an identical interpreted path
  * for completeness. Replayable in DuckDB via `list_reduce` over
  * `ascii(char)` (OracleSql q30) — values are equal codepoint-for-codepoint.
  */
case class RollingHash(child: Expression, modulus: Long = RollingHash.DefaultModulus)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingHash.hash($c.toString(), ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val DefaultModulus: Long = 1000000007L

  /** Shared by both the interpreted and generated paths. */
  def hash(s: String, modulus: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % modulus
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column API entry point. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(c)))
}
