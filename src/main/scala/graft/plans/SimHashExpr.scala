package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit SimHash over single-space word tokens, term-frequency
  * weighted — one pass per document inside whole-stage codegen.
  *
  * Computes exactly the value of the aggregation formulation in
  * `Dedup.simhashPairs` (explode words → md5-derived 32-bit hash → 32
  * conditional bit-majority sums): word hash = first 8 hex chars of
  * `md5(word)` parsed base-16, bit j votes +1 if set else −1, final bit j
  * set iff its sum is positive. Equivalence is asserted in `DedupSpec` and
  * by the unchanged q22 DuckDB oracle.
  *
  * Why an expression instead of the aggregation: the explode materializes
  * |words| rows and runs partial-aggregation machinery per word; this is a
  * tight loop over the text bytes with zero row expansion — the signature
  * stage of the pipeline becomes a pure map.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 hex chars of md5(word) parsed base-16 — bit-for-bit the value
    * of `conv(substring(md5(word), 1, 8), 16, 10)` in Spark/DuckDB SQL.
    */
  private def wordHash(bytes: Array[Byte], from: Int, until: Int): Long = {
    val md = mdLocal.get()
    md.reset()
    md.update(bytes, from, until - from)
    val digest = md.digest()
    // first 8 hex chars = first 4 digest bytes
    var h = 0L
    var i = 0
    while (i < 4) {
      h = (h << 8) | (digest(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Shared by interpreted eval and generated code. Token semantics match
    * `split(text, " ", -1)`: single-space separator, empty tokens kept
    * (an empty token hashes md5 of zero bytes, as the SQL form does).
    */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val sums  = new Array[Int](32)
    var start = 0
    var i     = 0
    val n     = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        val h = wordHash(bytes, start, i)
        var j = 0
        while (j < 32) {
          if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column API entry point. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(SimHashExpr(GraftColumnBridge.expression(c)))
}
