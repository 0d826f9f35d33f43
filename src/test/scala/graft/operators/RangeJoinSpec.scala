package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("points match exactly the intervals containing them (inclusive bounds)") {
    val points = Seq(
      (1L, 5L, "a"),    // inside [0,10]
      (1L, 10L, "b"),   // at inclusive end
      (1L, 11L, "c"),   // in gap → dropped
      (1L, 25L, "d"),   // inside [20,30], different bucket than its start
      (2L, 5L, "e")     // other key, no intervals → dropped
    ).toDF("k", "t", "tag")
    val intervals = Seq(
      (1L, 0L, 10L, 100L),
      (1L, 20L, 30L, 200L)
    ).toDF("k", "lo", "hi", "iid")

    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi", bucketWidth = 7L)
      .select("tag", "iid").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 100L, "b" -> 100L, "d" -> 200L))
  }

  test("an interval spanning many buckets matches a point exactly once") {
    val points = Seq((1L, 50L, "p")).toDF("k", "t", "tag")
    val intervals = Seq((1L, 0L, 100L, 7L)).toDF("k", "lo", "hi", "iid")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi", bucketWidth = 3L)
    assert(got.count() === 1)
  }
}
