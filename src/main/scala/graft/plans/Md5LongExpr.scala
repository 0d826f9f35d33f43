package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-hex prefix → non-negative int64, computed straight from the digest
  * bytes — bit-for-bit `conv(substring(md5(s), 1, hexChars), 16, 10)`
  * (DuckDB: `CAST('0x'||substr(md5(x),1,n) AS BIGINT)`), which is the form
  * every oracle replays.
  *
  * Why an expression instead of the built-in chain: `Dedup.md5Long` is the
  * engine's universal deterministic-uniform primitive (~80 call sites —
  * shingle lanes, sampling uniforms, split assignment, HLL registers,
  * decontamination grams), and the built-in chain pays, PER ROW, a 32-char
  * hex string materialization, a substring copy, conv's base-16 re-parse,
  * and a fresh MessageDigest allocation inside commons-codec. This computes
  * the same 4·hexChars bits from the first ceil(hexChars/2) digest bytes on
  * a thread-local digest: one hash, zero string round-trips (optimization
  * guide §1.2 step 2 — per-task work; equivalence spec: Md5LongExprSpec).
  *
  * hexChars ≤ 15 keeps the value inside a signed long (the 16-char form
  * would need the sign bit); every call site uses 1..12.
  */
case class Md5LongExpr(child: Expression, hexChars: Int) extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15,
    s"graft_md5_long supports 1..15 hex chars, got $hexChars")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_long requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_long"

  override def nullSafeEval(input: Any): Any =
    Md5LongExpr.compute(input.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5LongExpr.compute($c, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): Md5LongExpr =
    copy(child = newChild)
}

object Md5LongExpr {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String, hexChars: Int): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val nBytes = (hexChars + 1) / 2
    var v = 0L
    var i = 0
    while (i < nBytes) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    // odd prefix length = drop the low nibble of the last byte
    if ((hexChars & 1) == 1) v >>>= 4
    v
  }

  /** Column API entry point. */
  def apply(c: Column, hexChars: Int): Column =
    GraftColumnBridge.column(Md5LongExpr(GraftColumnBridge.expression(c), hexChars))
}
