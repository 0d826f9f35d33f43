package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RankStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spearman: monotone agreement gives rho = 1, reversal gives -1") {
    val up = (1L to 10L).map(i => (i, i, i * 10L)).toDF("id", "x", "y")
    val down = (1L to 10L).map(i => (i, i, -i * 10L)).toDF("id", "x", "y")
    val (nU, rhoU) = RankStats.spearman(up, "id", "x", "y")
      .as[(Long, Double)].head()
    val (nD, rhoD) = RankStats.spearman(down, "id", "x", "y")
      .as[(Long, Double)].head()
    assert(nU === 10L && rhoU === 1.0)
    assert(nD === 10L && rhoD === -1.0)
  }

  test("spearman matches a BigInt reimplementation of the rational formula") {
    val xs = Seq(5L, 9L, 1L, 7L, 3L, 8L, 2L, 10L, 4L, 6L)
    val ys = Seq(2L, 8L, 3L, 9L, 1L, 10L, 4L, 7L, 6L, 5L)
    val df = xs.zip(ys).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
    val got = RankStats.spearman(df, "id", "x", "y")
      .as[(Long, Double)].head()._2

    val n = BigInt(xs.size)
    def ranks(v: Seq[Long]): Seq[Int] = {
      val order = v.zipWithIndex.sortBy { case (value, id) => (value, id) }
      val r = new Array[Int](v.size)
      order.zipWithIndex.foreach { case ((_, id), pos) => r(id) = pos + 1 }
      r.toSeq
    }
    val sxy = ranks(xs).zip(ranks(ys)).map { case (a, b) => BigInt(a) * b }.sum
    val num = 12 * sxy - 3 * n * (n + 1) * (n + 1)
    val den = n * n * n - n
    val micro =
      if (num >= 0) (2 * num * 1000000 + den) / (2 * den)
      else -((2 * -num * 1000000 + den) / (2 * den))
    assert(got === micro.toDouble / 1e6)
  }

  test("auc: perfect separation gives 1, reversed gives 0") {
    val perfect = ((1L to 5L).map(i => (i, i + 100L, 1)) ++
      (6L to 10L).map(i => (i, i, 0))).toDF("id", "score", "label")
    val reversed = ((1L to 5L).map(i => (i, i, 1)) ++
      (6L to 10L).map(i => (i, i + 100L, 0))).toDF("id", "score", "label")
    assert(RankStats.auc(perfect, "id", "score", "label")
      .as[(Long, Long, Double)].head() === ((5L, 5L, 1.0)))
    assert(RankStats.auc(reversed, "id", "score", "label")
      .as[(Long, Long, Double)].head() === ((5L, 5L, 0.0)))
  }

  test("auc equals the naive concordant-pair count under the same tie-break") {
    val scores = Seq(3L, 7L, 7L, 2L, 9L, 3L, 5L, 8L, 1L, 7L)
    val labels = Seq(1, 0, 1, 0, 1, 0, 0, 1, 0, 1)
    val df = scores.zip(labels).zipWithIndex
      .map { case ((s, l), i) => (i.toLong, s, l) }.toDF("id", "score", "label")
    val got = RankStats.auc(df, "id", "score", "label")
      .as[(Long, Long, Double)].head()

    // rank by (score, id); AUC = concordant pairs / (P·N)
    val ranked = scores.zipWithIndex.sortBy { case (s, i) => (s, i) }
      .zipWithIndex.map { case ((_, i), pos) => i -> (pos + 1) }.toMap
    val pos = labels.zipWithIndex.collect { case (1, i) => ranked(i) }
    val neg = labels.zipWithIndex.collect { case (0, i) => ranked(i) }
    val conc = (for (p <- pos; q <- neg) yield if (p > q) 1L else 0L).sum
    val den = BigInt(2) * pos.size * neg.size
    val micro = (2 * BigInt(2 * conc) * 1000000 + den) / (2 * den)
    assert(got._1 === pos.size.toLong && got._2 === neg.size.toLong)
    assert(got._3 === micro.toDouble / 1e6)
  }

  test("both are invariant to input partitioning") {
    val df = (1L to 40L).map(i => (i, i * 7 % 13, i * 11 % 17)).toDF("id", "x", "y")
    val a = RankStats.spearman(df, "id", "x", "y").as[(Long, Double)].head()
    val b = RankStats.spearman(df.repartition(7), "id", "x", "y").as[(Long, Double)].head()
    assert(a === b)
  }
}
