package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EmbeddingStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("covariance matches the hand-computed population covariance") {
    // dims: x = [1,2,3], y = [2,4,6] (perfectly correlated), z = [5,5,5]
    val vecs = Seq(
      Seq(1.0f, 2.0f, 5.0f),
      Seq(2.0f, 4.0f, 5.0f),
      Seq(3.0f, 6.0f, 5.0f)).toDF("embedding")
    val got = EmbeddingStats.covarianceUpperTriangle(vecs, "embedding")
      .select("i", "j", "cov_e6").as[(Long, Long, Long)].collect()
      .map { case (i, j, c) => (i, j) -> c / 1e6 }.toMap
    val varX = 2.0 / 3.0 // population variance of [1,2,3]
    assert(math.abs(got((0L, 0L)) - varX) < 1e-5)
    assert(math.abs(got((0L, 1L)) - 2 * varX) < 1e-5) // cov(x, 2x) = 2·var(x)
    assert(math.abs(got((1L, 1L)) - 4 * varX) < 1e-5)
    assert(got((0L, 2L)) === 0.0 && got((1L, 2L)) === 0.0 && got((2L, 2L)) === 0.0)
    assert(got.size === 6) // upper triangle of d=3
  }

  test("covariance is invariant to partitioning (exact integer sums)") {
    val base = (1 to 40).map(k => Seq((k % 7).toFloat / 3f, (k % 5).toFloat / 3f))
    val one  = base.toDF("embedding").coalesce(1)
    val many = base.toDF("embedding").repartition(13)
    val a = EmbeddingStats.covarianceUpperTriangle(one, "embedding")
      .select("i", "j", "cov_e6").as[(Long, Long, Long)].collect().toSet
    val b = EmbeddingStats.covarianceUpperTriangle(many, "embedding")
      .select("i", "j", "cov_e6").as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("power iteration recovers a dominant variance direction") {
    // dim 1 carries almost all the variance; the top eigenvector must
    // be ±e1 (loading 1.0 by the max-abs normalization) with the other
    // dims near zero.
    val vecs = (1 to 60).map { k =>
      Seq(0.01f * (k % 3), (k % 11).toFloat - 5f, 0.02f * (k % 2))
    }.toDF("embedding")
    val v = EmbeddingStats.powerIteration(spark, vecs, "embedding")
      .select("dim", "loading").as[(Long, Double)].collect().toMap
    assert(math.abs(v(1L)) === 1.0)
    assert(math.abs(v(0L)) < 0.05 && math.abs(v(2L)) < 0.05)
  }

  test("power iteration is invariant to partitioning") {
    val base = (1 to 50).map(k => Seq((k % 7).toFloat, (k % 5).toFloat, (k % 3).toFloat))
    val a = EmbeddingStats.powerIteration(spark, base.toDF("embedding").coalesce(1), "embedding")
      .select("dim", "v_q").as[(Long, Long)].collect().toSet
    val b = EmbeddingStats.powerIteration(spark, base.toDF("embedding").repartition(11), "embedding")
      .select("dim", "v_q").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("diagonal dominates: |cov(i,j)| <= sqrt(var_i * var_j) + rounding slack") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cov = EmbeddingStats.covarianceUpperTriangle(e, "embedding")
      .select("i", "j", "cov_e6").as[(Long, Long, Long)].collect()
      .map { case (i, j, c) => (i, j, c / 1e6) }
    val diag = cov.collect { case (i, j, c) if i == j => i -> c }.toMap
    cov.foreach { case (i, j, c) =>
      assert(math.abs(c) <= math.sqrt(diag(i) * diag(j)) + 1e-4)
    }
  }
}
