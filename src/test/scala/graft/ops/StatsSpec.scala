package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** A1-A9 goldens on a literal table (notebook cells 10-17 shapes). */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    ("a", "xx"), ("a", "xxxx"), ("a", "xxxxxx"),
    ("b", "x"), ("b", "xxx")
  ).toDF("cls", "txt")

  test("summary: count, distinct classes, min/max/median length") {
    val r = Stats.summary(df, "cls", "txt").collect()(0)
    assert(r.getLong(0) === 5L)          // n_rows
    assert(r.getLong(1) === 2L)          // n_classes
    assert(r.getLong(2) === 1L)          // min_len
    assert(r.getLong(3) === 6L)          // max_len
    assert(r.getDouble(4) === 3.0)       // median of {2,4,6,1,3}
  }

  test("valueCounts: descending with key tie-break") {
    val got = Stats.valueCounts(df, "cls").as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 3L), ("b", 2L)))
  }

  test("groupSizeStats: min/max/avg of group sizes") {
    val r = Stats.groupSizeStats(df, "cls").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 3L, 2.5)))
  }

  test("groupSizeHistogram") {
    val got = Stats.groupSizeHistogram(df, "cls").as[(Long, Long)].collect().toSeq
    assert(got === Seq((2L, 1L), (3L, 1L)))
  }

  test("lengthFrequencies") {
    val got = Stats.lengthFrequencies(df, "txt").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (6L, 1L)))
  }

  test("madOutliers: robust flags; MAD=0 group flags any deviation at all") {
    // a: median 3, adevs {2,1,0,1,97}, MAD 1 → only 97 exceeds 3·MAD
    // b: >half identical → MAD 0 → the single deviating row is flagged
    val vals = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
      ("b", 5L), ("b", 5L), ("b", 5L), ("b", 9L)
    ).toDF("grp", "v")
    val got = Stats.madOutliers(vals, "grp", "v")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(got === Seq(("a", 5L, 3.0, 1.0, 1L), ("b", 4L, 5.0, 0.0, 1L)))
  }

  test("winsorized mean: one outlier clips to the interpolated p95, raw mean stays exposed") {
    // 19×100 + one 10000: p95 at position 18.05 interpolates to 595.0, so
    // winsorized = (19·100 + 595)/20 = 124.75 while raw = 595.0
    val vals = ((1 to 19).map(_ => ("a", 100L)) :+ (("a", 10000L))).toDF("grp", "v")
    val got = Stats.winsorizedStats(vals, "v", "grp")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got === Seq(("a", 20L, 100.0, 595.0, 595.0, 124.75)))
  }

  test("poisson thresholds are sane and bootstrap CI degenerates on constant data") {
    // cumulative Poisson(1): ~0.3679, 0.7358, 0.9197, ... monotone toward 2^48
    val c = Stats.PoissonCum48
    assert(c.length === 9 && c === c.sorted)
    assert(math.abs(c.head.toDouble / math.pow(2, 48) - math.exp(-1.0)) < 1e-12)
    assert(c.last.toDouble / math.pow(2, 48) > 0.999998) // P(K > 8) ~ 1.1e-6
    // every resample of a constant column has mean exactly 42
    val docs = (1L to 50L).map(i => (i, 42L, "a")).toDF("id", "v", "grp")
    val got = Stats.bootstrapMeanCI(docs, "v", "id", "grp")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got === Seq(("a", 32L, 42.0, 42.0)))
    // deterministic: a second invocation is bit-identical
    val again = Stats.bootstrapMeanCI(docs, "v", "id", "grp")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(again === got)
  }
}
