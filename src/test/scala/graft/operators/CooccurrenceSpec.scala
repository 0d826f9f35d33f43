package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CooccurrenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PMI is ln(c_ab*N/(c_a*c_b)) over document containment, above support") {
    // a+b always together (PMI > 0); a+c in one of a's two docs; d alone
    val docs = Seq(
      (1L, "a b"), (2L, "a b c"), (3L, "c d"), (4L, "d e")
    ).toDF("doc_id", "text")
    val got = Cooccurrence.pmiPairs(docs, "doc_id", "text", minSupportDenom = 4, topK = 10)
      .as[(String, String, Long, Double)].collect()
      .map { case (a, b, c, p) => (a, b) -> ((c, p)) }.toMap
    def pmi(cab: Long, ca: Long, cb: Long) =
      BigDecimal(math.log(cab.toDouble * 4 / (ca * cb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("a", "b")) === ((2L, pmi(2, 2, 2))))   // always together
    assert(got(("a", "c")) === ((1L, pmi(1, 2, 2))))   // half the time
    assert(got(("c", "d")) === ((1L, pmi(1, 2, 2))))
    assert(!got.contains(("a", "e"))) // never co-occur → no pair row
  }
}
