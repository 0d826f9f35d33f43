package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side integer-PageRank reference (same micro-unit formula). */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    var r = adj.keys.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val in = adj.toSeq
        .flatMap { case (u, ns) => ns.map(v => v -> (r(u) / deg(u))) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      r = in.map { case (k, s) => k -> (150000L + 850L * s / 1000L) }
    }
    r
  }

  test("pageRankInt matches the driver-side reference on a hub-and-chain graph") {
    // Star 1-{2,3,4,5} plus a tail 5-6-7: the hub must outrank the tail.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (5L, 6L), (6L, 7L))
    val got = GraphMetrics.pageRankInt(pairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(got === refRanks(pairs, 3))
    assert(got(1L) === got.values.max) // hub is top-ranked
  }

  test("pageRankInt is invariant to input partitioning (integer arithmetic)") {
    val pairs = (1L to 40L).map(i => (i, i % 7 + 100L))
    val one = GraphMetrics.pageRankInt(pairs.toDF("doc_a", "doc_b").coalesce(1))
      .as[(Long, Long)].collect().toMap
    val many = GraphMetrics.pageRankInt(pairs.toDF("doc_a", "doc_b").repartition(13))
      .as[(Long, Long)].collect().toMap
    assert(one === many)
  }

  test("triangleStats counts the known triangles of a mixed graph") {
    // Triangle {1,2,3}; square {4,5,6,7} (no triangle); pendant 3-8.
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (5L, 6L), (6L, 7L), (4L, 7L),
      (3L, 8L))
    val got = GraphMetrics.triangleStats(pairs.toDF("doc_a", "doc_b"))
      .select("node", "n_triangles").as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 0L, 5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 0L))
  }

  test("triangleStats clustering coefficient: K4 is fully clustered") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val rows = GraphMetrics.triangleStats(k4.toDF("doc_a", "doc_b"))
      .select("node", "degree", "n_triangles", "clustering")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === 4)
    // Every node: degree 3, sits in C(3,2)=3 triangles, coefficient 1.0.
    rows.foreach { case (_, d, t, c) => assert(d === 3L && t === 3L && c === 1.0) }
  }
}
