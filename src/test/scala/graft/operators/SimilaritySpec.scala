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

  test("incremental ANN against a persisted bucket store matches ivfTopK") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val store = Similarity.assignBuckets(corpus, "vec_id", "embedding", nCentroids = 8)
    val inc = Similarity.incrementalTopK(
      corpus.filter(col("vec_id") < 5).select(col("vec_id"), col("embedding")),
      store, "vec_id", "embedding", nCentroids = 8, k = 5, excludeSelf = true)
      .as[(Long, Long, Double, Long)].collect().toSeq
    val full = Similarity.ivfTopK(corpus, "vec_id", "embedding",
      nCentroids = 8, nQueries = 5, k = 5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(inc === full)
    assert(inc.nonEmpty)
  }

  test("incremental ANN over a MULTI-probe store never repeats a neighbor") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // one row per (vector, bucket): vectors sit in 2 buckets each
    val store = Similarity.assignBucketsMulti(corpus, "vec_id", "embedding",
      nCentroids = 8, probes = 2)
    val got = Similarity.incrementalTopK(
      corpus.filter(col("vec_id") < 5).select(col("vec_id"), col("embedding")),
      store, "vec_id", "embedding", nCentroids = 8, k = 5,
      multiProbe = 2, excludeSelf = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.distinct === got, "a doubly-bucketed candidate occupied two top-k slots")
  }

  test("IVF with one centroid reduces to brute force") {
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", nQueries = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSeq
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", nCentroids = 1, nQueries = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(ivf === bf)
  }

  // centroids: 0 = e_x, 1 = e_y. vec 2 (0.8, 0.6) → bucket 0;
  // vec 3 (0.6, 0.8) → bucket 1. sim(2,3) = 0.96 — the best neighbor of
  // query 2 lives in the OTHER bucket.
  private val boundary = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f)),
    (2L, Seq(0.8f, 0.6f)),
    (3L, Seq(0.6f, 0.8f))
  ).toDF("vec_id", "embedding")

  test("single-probe IVF misses the cross-bucket neighbor; multi-probe recovers it") {
    def neighborsOf2(mp: Int): Seq[Long] =
      Similarity.ivfTopK(boundary, "vec_id", "embedding", nCentroids = 2, nQueries = 3, k = 3, multiProbe = mp)
        .filter($"query_id" === 2L)
        .select("neighbor_id").as[Long].collect().toSeq
    assert(neighborsOf2(1) === Seq(0L))           // own bucket only
    assert(neighborsOf2(2) === Seq(3L, 0L, 1L))   // 0.96 > 0.8 > 0.6
  }

  test("multi-probe near-dup recovers the pair straddling a bucket boundary") {
    def pairs(p: Int): Set[(Long, Long)] =
      Similarity.embedNearDupPairs(boundary, "vec_id", "embedding",
        nCentroids = 2, threshold = 0.9, probes = p)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // sim(2,3) = 0.96 but they live in different single-probe buckets
    assert(!pairs(1).contains((2L, 3L)))
    assert(pairs(2).contains((2L, 3L)))
  }

  test("clustered corpus: centroids sampled from the cluster split the hot bucket") {
    // 64 vectors all within ~6° of e_x (one tight cluster); centroids are
    // the first 8 vectors — themselves cluster members. A single external
    // centroid would put all 64 in one bucket (the skew case); in-cluster
    // centroids must divide it, bounding any probe at far below N.
    val n = 64
    val clustered = (0 until n).map { i =>
      val a = 0.1 * math.sin(2 * math.Pi * i / n)
      val b = 0.1 * math.cos(2 * math.Pi * i / n)
      (i.toLong, Seq(1.0f, a.toFloat, b.toFloat))
    }.toDF("vec_id", "embedding")
    val sizes = Similarity.assignBuckets(clustered, "vec_id", "embedding", nCentroids = 8)
      .groupBy("bucket").count().select("count").as[Long].collect()
    assert(sizes.sum === n.toLong)         // every vector assigned exactly once
    assert(sizes.max <= n / 2, s"hot bucket ${sizes.max} of $n — cluster did not split")
  }

  test("semantic decontamination flags the train vector parallel to an eval vector") {
    // train 10 is parallel to eval 1 (cos 1.0 — same LSH signature, always
    // banded together); train 11 is antipodal (cos −1.0, complement
    // signature — never shares a band); train 12 is parallel to eval 2.
    val eval  = Seq((1L, Seq(1.0f, 0.2f, 0.0f, 0.1f)), (2L, Seq(-0.3f, 1.0f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (10L, Seq(2.0f, 0.4f, 0.0f, 0.2f)),
      (11L, Seq(-1.0f, -0.2f, 0.0f, -0.1f)),
      (12L, Seq(-0.6f, 2.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticContamination(eval, train, "vec_id", "embedding", dim = 4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((10L, 1L, 1.0), (12L, 1L, 1.0)))
  }

  test("Lloyd step: bucket means are the exact quantized component averages") {
    // centroids 0=(1,0), 1≈(0.9,0.1): vec0→c0; vecs 1,2,3→c1 (cosine argmax)
    // c1 mean = ((0.9+0−1)/3, (0.1+1+0)/3) with float→double quantization
    val got = Similarity.lloydStep(emb, "vec_id", "embedding", nCentroids = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 0L, 1L, 1.0), (0L, 1L, 1L, 0.0),
      (1L, 0L, 3L, -0.033333), (1L, 1L, 3L, 0.366667)))
  }

  test("kNN vote: majority label wins; vote ties break to the smaller label") {
    val labeled = Seq(
      (0L, Seq(1.0f, 0.0f), 9),
      (1L, Seq(0.9f, 0.1f), 7),  // rank 1 from vec 0
      (2L, Seq(0.0f, 1.0f), 5),  // rank 2
      (3L, Seq(-1.0f, 0.0f), 5)  // rank 3
    ).toDF("vec_id", "embedding", "label")
    // k=3: labels {7, 5, 5} → 5 by majority
    val maj = Similarity.knnClassify(labeled, "vec_id", "embedding", "label", nQueries = 1, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(maj.map(r => (r._1, r._2, r._3)) === Seq((0L, 5L, 2L)))
    // k=2: labels {7, 5} → one vote each, tie → smaller label 5
    val tie = Similarity.knnClassify(labeled, "vec_id", "embedding", "label", nQueries = 1, k = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(tie.map(r => (r._1, r._2, r._3)) === Seq((0L, 5L, 1L)))
  }

  test("kmeansFit: two tight blobs keep their members and score near-1 cohesion") {
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),  // seed A
      (1L, Seq(0.0f, 1.0f, 0.0f)),  // seed B
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.95f, 0.0f, 0.05f)),
      (4L, Seq(0.0f, 0.9f, 0.1f)),
      (5L, Seq(0.1f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansFit(rows, "vec_id", "embedding", nCentroids = 2, iters = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === Seq((0L, 3L), (1L, 3L)))
    got.foreach(r => assert(r._3 > 0.97, s"cluster ${r._1} cohesion ${r._3}"))
  }

  test("mmrRerank: exact duplicate of the top pick is demoted by the redundancy penalty") {
    // query 0 = e_x; 1 and 2 duplicate e_x; 3 = e_y, 4 = e_z (both rel 0)
    val m = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(m, "vec_id", "embedding", queryId = 0L, k = 3)
      .as[(Long, Long, Double, Long)].collect().toSeq
    // step 1: argmax rel (min-id tie-break) = 1, score 7·1e6
    // step 2: dup 2 scores 7e6 − 3e6 = 4e6, beats orthogonal 3 at 0
    // step 3: 3 and 4 tie at 0 → min id 3
    assert(got === Seq(
      (1L, 1L, 1.0, 7000000L),
      (2L, 2L, 1.0, 4000000L),
      (3L, 3L, 0.0, 0L)))
  }

  test("mmrRerank step 1 equals the brute-force top-1") {
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", nQueries = 1, k = 1)
      .select("neighbor_id").as[Long].head()
    val mmr = Similarity.mmrRerank(emb, "vec_id", "embedding", queryId = 0L, k = 1)
      .select("vec_id").as[Long].head()
    assert(mmr === bf)
  }

  test("hardExamples: positive is best same-label, negative best other-label, margin signed") {
    // label 0: vecs 0,1 (near-parallel); label 1: vecs 2,3
    val lab = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.0f, 1.0f), 1), (3L, Seq(-1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardExamples(lab, "vec_id", "embedding", "label", nQueries = 1)
      .select("query_id", "label", "pos_id", "neg_id", "margin")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.length === 1)
    val (q, l, pos, neg, margin) = got.head
    assert((q, l, pos, neg) === (0L, 0L, 1L, 2L)) // neg ties (0.0 > -1.0): vec 2 wins
    assert(margin > 0.99 && margin < 1.0)
  }

  test("hardExamples: a query whose label has no second member yields null positive") {
    val lab = Seq(
      (0L, Seq(1.0f, 0.0f), 7), (1L, Seq(0.9f, 0.1f), 0), (2L, Seq(0.0f, 1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val row = Similarity.hardExamples(lab, "vec_id", "embedding", "label", nQueries = 1)
      .collect()(0)
    assert(row.isNullAt(row.fieldIndex("pos_id")))
    assert(row.getLong(row.fieldIndex("neg_id")) === 1L) // best other-label
    assert(row.isNullAt(row.fieldIndex("margin")))
  }
}
