package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // vec 0 = e_x; vec 1 ~ e_x (rotated slightly); vec 2 = e_y; vec 3 = -e_x
  private val emb = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f)),
    (2L, Seq(0.0f, 1.0f)),
    (3L, Seq(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with id tie-break") {
    val got = Similarity.bruteForceTopK(emb, "vec_id", "embedding", nQueries = 1, k = 3)
      .select("neighbor_id", "rk").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 2L), (3L, 3L))) // near, orthogonal, opposite
  }

  test("cosine values: identical-direction 1.0, orthogonal 0.0, opposite -1.0") {
    val sims = Similarity.bruteForceTopK(emb, "vec_id", "embedding", nQueries = 1, k = 3)
      .select("neighbor_id", "sim").as[(Long, Double)].collect().toMap
    assert(sims(2L) === 0.0)
    assert(sims(3L) === -1.0)
    assert(sims(1L) > 0.99 && sims(1L) < 1.0)
  }

  test("IVF with centroids=all vectors buckets each vector with itself") {
    val got = Similarity.ivfTopK(emb, "vec_id", "embedding", nCentroids = 4, nQueries = 2, k = 2)
      .select("query_id", "neighbor_id", "rk").as[(Long, Long, Long)].collect()
    // every vector is its own centroid → buckets of size 1 → no neighbors
    assert(got.isEmpty)
  }

  test("IVF with one centroid reduces to brute force") {
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", nQueries = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSeq
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", nCentroids = 1, nQueries = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(ivf === bf)
  }
}
