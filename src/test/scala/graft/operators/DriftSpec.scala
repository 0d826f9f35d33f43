package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ks: identical samples give 0, disjoint supports give 1") {
    val same = ((1L to 20L).map(v => (v, "a")) ++ (1L to 20L).map(v => (v, "b")))
      .toDF("v", "g")
    val disjoint = ((1L to 10L).map(v => (v, "a")) ++ (11L to 20L).map(v => (v, "b")))
      .toDF("v", "g")
    assert(Drift.ksStatistic(same, "v", "g", "a", "b")
      .as[(Long, Long, Double)].head() === ((20L, 20L, 0.0)))
    assert(Drift.ksStatistic(disjoint, "v", "g", "a", "b")
      .as[(Long, Long, Double)].head() === ((10L, 10L, 1.0)))
  }

  test("ks matches the hand-computed 1/3 example") {
    // A = {1,2,3}, B = {2,3,4}: max |F_a - F_b| = 1/3 → 0.333333 after
    // half-away micro rounding
    val df = (Seq(1L, 2L, 3L).map((_, "a")) ++ Seq(2L, 3L, 4L).map((_, "b")))
      .toDF("v", "g")
    assert(Drift.ksStatistic(df, "v", "g", "a", "b")
      .as[(Long, Long, Double)].head() === ((3L, 3L, 0.333333)))
  }

  test("ks ignores rows outside the two cohorts and survives repartitioning") {
    val df = ((1L to 15L).map(v => (v, "a")) ++ (4L to 18L).map(v => (v, "b")) ++
      Seq((99L, "other"))).toDF("v", "g")
    val x = Drift.ksStatistic(df, "v", "g", "a", "b").as[(Long, Long, Double)].head()
    val y = Drift.ksStatistic(df.repartition(5), "v", "g", "a", "b")
      .as[(Long, Long, Double)].head()
    assert(x._1 === 15L && x._2 === 15L && x === y)
  }

  test("psi: identical category mixes give all-zero terms") {
    val df = (Seq.fill(6)("x") ++ Seq.fill(4)("y")).flatMap(c => Seq((c, "a"), (c, "b")))
      .toDF("cat", "g")
    val terms = Drift.psi(df, "cat", "g", "a", "b")
      .as[(String, Long, Long, Double)].collect()
    assert(terms.length === 2)
    assert(terms.forall(_._4 === 0.0))
  }

  test("psi matches a hand-rolled smoothed computation") {
    // a: 8×x, 2×y ; b: 3×x, 7×y — k = 2 categories, add-one smoothing
    val df = ((Seq.fill(8)("x") ++ Seq.fill(2)("y")).map((_, "a")) ++
      (Seq.fill(3)("x") ++ Seq.fill(7)("y")).map((_, "b"))).toDF("cat", "g")
    val got = Drift.psi(df, "cat", "g", "a", "b")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)

    def term(ca: Long, cb: Long): Double = {
      val p = (ca + 1).toDouble / 12.0
      val q = (cb + 1).toDouble / 12.0
      math.round((p - q) * math.log(p / q) * 1e9) / 1e9
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq === Seq("x", "y"))
    assert(got(0)._2 === 8L && got(0)._3 === 3L)
    assert(got(0)._4 === round6(term(8, 3)))
    assert(got(1)._4 === round6(term(2, 7)))
  }
}
