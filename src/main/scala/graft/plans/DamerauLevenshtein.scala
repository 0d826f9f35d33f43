package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native UNRESTRICTED Damerau-Levenshtein distance (Lowrance-Wagner) —
  * adjacent transpositions cost 1 and, unlike the optimal-string-alignment
  * variant, a transposed pair may be edited again afterwards ("CA" → "ABC"
  * is 2, not 3). Spark ships only plain `levenshtein`; the q320 oracle is
  * the independent third-party implementation of the same published
  * algorithm (probed: it is the true DL, not OSA). Pure integer DP — no
  * floating point anywhere, so engine agreement is exact by construction.
  *
  * Byte-level over the UTF-8 encoding (identical to character semantics on
  * ASCII inputs — all dimension strings here; the `da` last-seen table is
  * indexed by byte value).
  */
case class DamerauLevenshtein(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_damerau_levenshtein requires string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

object DamerauLevenshtein {

  /** Lowrance-Wagner DP with the 256-entry last-occurrence table. Shared by
    * interpreted eval and generated code.
    */
  def distance(a: UTF8String, b: UTF8String): Long = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2.toLong
    if (l2 == 0) return l1.toLong

    val inf = l1 + l2
    // d is (l1+2) x (l2+2), flattened
    val w = l2 + 2
    val d = new Array[Int]((l1 + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= l1) { d((i + 1) * w + 1) = i; d((i + 1) * w) = inf; i += 1 }
    var j = 0
    while (j <= l2) { d(w + j + 1) = j; d(j + 1) = inf; j += 1 }

    val da = new Array[Int](256)
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val i1 = da(s2(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (s1(i - 1) == s2(j - 1)) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val tra = d(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (tra < m) m = tra
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da(s1(i - 1) & 0xff) = i
      i += 1
    }
    d((l1 + 1) * w + l2 + 1).toLong
  }

  /** Column API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DamerauLevenshtein(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
