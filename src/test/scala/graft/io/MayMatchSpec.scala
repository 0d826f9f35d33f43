package graft.io

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Truth table for the zone-map predicate evaluator behind
  * [[TxLogFileIndex]]: pruning must be exactly as aggressive as the
  * range arithmetic allows and NEVER more — a wrong `false` here is a
  * silently dropped file (wrong answers), a wrong `true` only costs a
  * footer read.
  */
class MayMatchSpec extends AnyFunSuite {
  private val d = AttributeReference("d", LongType)()
  private val other = AttributeReference("other", LongType)()
  private val cs: TxLog.ColStats = Map("d" -> (100L, 200L))
  private def lit(v: Long): Literal = Literal(v, LongType)

  private def check(e: Expression, expected: Boolean): Unit =
    assert(TxLogFileIndex.mayMatch(e, cs) === expected, e.toString)

  test("range comparisons prune exactly at the zone-map boundaries") {
    // attribute op literal
    check(GreaterThanOrEqual(d, lit(200)), true)  // hi == bound: keep
    check(GreaterThanOrEqual(d, lit(201)), false) // hi < bound: skip
    check(GreaterThan(d, lit(199)), true)
    check(GreaterThan(d, lit(200)), false)
    check(LessThanOrEqual(d, lit(100)), true)
    check(LessThanOrEqual(d, lit(99)), false)
    check(LessThan(d, lit(101)), true)
    check(LessThan(d, lit(100)), false)
    check(EqualTo(d, lit(100)), true)
    check(EqualTo(d, lit(200)), true)
    check(EqualTo(d, lit(99)), false)
    check(EqualTo(d, lit(201)), false)
    // literal op attribute (reversed operands flip the inequality)
    check(GreaterThanOrEqual(lit(100), d), true)  // 100 >= d ⇔ d <= 100
    check(GreaterThanOrEqual(lit(99), d), false)
    check(GreaterThan(lit(101), d), true)         // 101 > d ⇔ d < 101
    check(GreaterThan(lit(100), d), false)
    check(LessThanOrEqual(lit(200), d), true)     // 200 <= d ⇔ d >= 200
    check(LessThanOrEqual(lit(201), d), false)
    check(LessThan(lit(199), d), true)            // 199 < d ⇔ d > 199
    check(LessThan(lit(200), d), false)
    check(EqualTo(lit(150), d), true)
    check(EqualTo(lit(250), d), false)
  }

  test("conjunction prunes when either side does; disjunction only when both do") {
    check(And(GreaterThanOrEqual(d, lit(150)), LessThanOrEqual(d, lit(160))), true)
    check(And(GreaterThanOrEqual(d, lit(201)), LessThanOrEqual(d, lit(300))), false)
    check(And(GreaterThanOrEqual(d, lit(150)), LessThanOrEqual(d, lit(90))), false)
    check(Or(EqualTo(d, lit(50)), EqualTo(d, lit(150))), true)
    check(Or(EqualTo(d, lit(50)), EqualTo(d, lit(250))), false)
  }

  test("IN prunes only when every member misses the range") {
    check(In(d, Seq(lit(50), lit(150))), true)
    check(In(d, Seq(lit(50), lit(250))), false)
    check(In(d, Seq(lit(100))), true)
  }

  test("string zone maps prune equality/range/IN/prefix in UTF-8 byte order") {
    import org.apache.spark.sql.types.StringType
    val s = AttributeReference("lang", StringType)()
    val ss: TxLog.StrColStats = Map("lang" -> ("de", Some("fr")))
    def slit(v: String) = Literal(v)
    def checkS(e: Expression, expected: Boolean): Unit =
      assert(TxLogFileIndex.mayMatch(e, Map.empty, ss) === expected, e.toString)
    checkS(EqualTo(s, slit("en")), true)
    checkS(EqualTo(s, slit("de")), true)   // lo boundary
    checkS(EqualTo(s, slit("fr")), true)   // hi boundary
    checkS(EqualTo(s, slit("da")), false)  // < lo
    checkS(EqualTo(s, slit("zh")), false)  // > hi
    checkS(EqualTo(slit("en"), s), true)   // reversed operands
    checkS(EqualTo(slit("zh"), s), false)
    checkS(GreaterThanOrEqual(s, slit("fr")), true)
    checkS(GreaterThanOrEqual(s, slit("fs")), false)
    checkS(GreaterThan(s, slit("fr")), false)
    checkS(LessThanOrEqual(s, slit("de")), true)
    checkS(LessThan(s, slit("de")), false)
    checkS(In(s, Seq(slit("aa"), slit("en"))), true)
    checkS(In(s, Seq(slit("aa"), slit("zz"))), false)
    checkS(StartsWith(s, slit("e")), true)
    checkS(StartsWith(s, slit("fr")), true)
    checkS(StartsWith(s, slit("fs")), false) // every "fs…" > hi
    checkS(StartsWith(s, slit("d")), true)
    checkS(StartsWith(s, slit("c")), false)  // every "c…" < lo
    // a truncated max (hi = None) prunes on the lower bound ONLY
    val trunc: TxLog.StrColStats = Map("lang" -> ("de", None))
    assert(TxLogFileIndex.mayMatch(EqualTo(s, slit("zz")), Map.empty, trunc))
    assert(!TxLogFileIndex.mayMatch(EqualTo(s, slit("da")), Map.empty, trunc))
    assert(!TxLogFileIndex.mayMatch(LessThan(s, slit("de")), Map.empty, trunc))
    assert(TxLogFileIndex.mayMatch(GreaterThan(s, slit("zz")), Map.empty, trunc))
  }

  test("anything unprovable keeps the file (conservative by construction)") {
    // stats-free column
    check(EqualTo(other, lit(5)), true)
    // non-literal comparand
    check(EqualTo(d, other), true)
    // unsupported shapes
    check(IsNotNull(d), true)
    check(Not(EqualTo(d, lit(150))), true)
    check(EqualTo(Abs(d), lit(150)), true)
    // non-integral literal
    check(EqualTo(d, Literal("x")), true)
    // empty stats map keeps everything
    assert(TxLogFileIndex.mayMatch(EqualTo(d, lit(5)), Map.empty))
  }
}
