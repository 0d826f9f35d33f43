package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over word 3-gram shingles — the whole
  * `numHashes`-value signature in one pass per document, no row expansion.
  *
  * Exactly the value of the explode-based formulation in
  * `Dedup.bandSignatures`: per shingle ONE md5 yields the
  * Kirsch-Mitzenmacher pair (h1 = first 12 hex chars base-16, h2 = next
  * 12), and hash k is `min over shingles of (h1 + k·h2) mod 2^48`.
  * Shingle semantics match [[WordShingles]] (single-space split, empties
  * kept, whole text when fewer than 3 words). Equivalence is asserted in
  * `DedupSpec`, and the q21/q23/q32/q40 oracles replay the same math in
  * DuckDB SQL unchanged.
  */
case class MinHashExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHashExpr.compute(input.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

object MinHashExpr {
  /** 2^48 — mirrors `Dedup.MinhashMod`. */
  val Mod: Long = 281474976710656L

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** (h1, h2) from one md5: first/second 12 hex chars base-16 = first/second
    * 6 digest bytes big-endian — bit-for-bit
    * `conv(substring(md5(s), 1|13, 12), 16, 10)`.
    */
  private def updateMins(mins: Array[Long], s: String): Unit = {
    val md = mdLocal.get()
    md.reset()
    val digest = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < 6) {
      h1 = (h1 << 8) | (digest(i) & 0xffL)
      h2 = (h2 << 8) | (digest(i + 6) & 0xffL)
      i += 1
    }
    var k = 0
    while (k < mins.length) {
      val v = (h1 + k * h2) % Mod
      if (v < mins(k)) mins(k) = v
      k += 1
    }
  }

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, numHashes: Int): UnsafeArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val words = text.toString.split(" ", -1)
    if (words.length < 3) {
      updateMins(mins, text.toString)
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + 2 < words.length) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1)).append(' ').append(words(i + 2))
        updateMins(mins, sb.toString)
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Column API entry point. */
  def apply(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashExpr(GraftColumnBridge.expression(c), numHashes))
}
