package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the record-linkage string metric Spark
  * lacks (it ships only `levenshtein` / `soundex`).
  *
  * Semantics are pinned, operation-for-operation, to the published
  * Jaro-Winkler definition as DuckDB evaluates it (probed empirically on
  * discriminating inputs so q310's oracle hash-matches bit-for-bit —
  * IEEE-754 doubles round identically on the JVM and in C++ when the
  * operation order is the same):
  *
  *   - match window `floor(max(|a|,|b|)/2) - 1` (min 0), greedy
  *     left-to-right matching, each target char used once;
  *   - transpositions `t` = half the out-of-order matched chars;
  *   - `jaro = (m/|a| + m/|b| + (m - t)/m) / 3.0` — the three quotients
  *     summed left-to-right, then ONE division by 3.0 (not a multiply by
  *     1/3, which rounds differently);
  *   - Winkler boost only when `jaro > 0.7` (strict): with `p` = common
  *     prefix capped at 4, `jw = jaro + (p * 0.1) * (1.0 - jaro)` —
  *     `p * 0.1` FIRST (3 * 0.1 != 0.3 exactly, so association order is
  *     observable at prefix 3);
  *   - either side empty (or no matches) → 0.0.
  *
  * Byte-level comparison over the UTF-8 encoding — identical to character
  * semantics on ASCII inputs (all corpus/dimension strings here), documented
  * rather than hidden for anything beyond.
  *
  * Ref behavior anchor: the reference's preprocessing has no fuzzy matcher
  * at all (nearest is exact equality in `raw_to_staging.py`); this is part
  * of the §2.9 record-linkage tier (q226 edit blocking, q297
  * Fellegi-Sunter) that a 100 TB curation pipeline needs.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler requires string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
}

object JaroWinkler {

  /** Shared by interpreted eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0

    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched2 = new Array[Boolean](l2)
    // matched indices of s1 in order (greedy assignment is order-preserving)
    val order1 = new Array[Int](math.min(l1, l2))
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1(i)
      var j = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var found = false
      while (j < hi && !found) {
        if (!matched2(j) && s2(j) == c) {
          matched2(j) = true
          order1(m) = i
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    // transpositions: compare s1's matched chars (in order) against s2's
    var t = 0
    var k = 0
    var j2 = 0
    while (k < m) {
      while (!matched2(j2)) j2 += 1
      if (s1(order1(k)) != s2(j2)) t += 1
      j2 += 1
      k += 1
    }
    t /= 2

    val md = m.toDouble
    var sim = (md / l1 + md / l2 + (md - t) / md) / 3.0

    if (sim > 0.7) {
      var p = 0
      val maxP = math.min(math.min(l1, l2), 4)
      while (p < maxP && s1(p) == s2(p)) p += 1
      sim = sim + (p * 0.1) * (1.0 - sim)
    }
    sim
  }

  /** Column API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaroWinkler(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
