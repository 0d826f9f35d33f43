package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("A-ES: every heavy-weight row outranks every light-weight row") {
    // ln(u)/w with w=1 vs w=0.01: the light key is 100·ln(u), strictly
    // more negative for any u < 1 — so weight dominates the md5 noise.
    val rows = (1L to 20L).map(i => (i, if (i <= 10) 1.0 else 0.01, "g"))
      .toDF("id", "wt", "grp")
    val got = Sampling.weightedTopKPerGroup(rows, "id", "wt", "grp", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got === (1L to 10L).toSet)
  }

  test("A-ES with equal weights reduces to the plain md5-uniform top-k") {
    val rows = (1L to 30L).map(i => (i, 1.0, "g")).toDF("id", "wt", "grp")
    val got = Sampling.weightedTopKPerGroup(rows, "id", "wt", "grp", k = 5)
      .select("id").as[Long].collect().toSet
    val byUniform = rows
      .withColumn("u", Sampling.md5Uniform($"id"))
      .orderBy($"u".desc, $"id").limit(5)
      .select("id").as[Long].collect().toSet
    assert(got === byUniform)
  }

  test("sampling is deterministic across invocations and repartitionings") {
    val rows = (1L to 50L).map(i => (i, 0.1 + (i % 7) * 0.1, "g")).toDF("id", "wt", "grp")
    val a = Sampling.weightedTopKPerGroup(rows, "id", "wt", "grp", k = 8)
      .select("id", "rk").as[(Long, Long)].collect().toSeq
    val b = Sampling.weightedTopKPerGroup(rows.repartition(13), "id", "wt", "grp", k = 8)
      .select("id", "rk").as[(Long, Long)].collect().toSeq
    assert(a.sorted === b.sorted)
  }
}
