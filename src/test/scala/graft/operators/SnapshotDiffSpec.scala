package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "A", "alpha"),
    (2L, "A", "beta"),
    (3L, "B", "gamma"),
    (5L, "B", null.asInstanceOf[String])
  ).toDF("id", "grp", "text")

  private val newSnap = Seq(
    (1L, "A", "alpha"),       // unchanged
    (2L, "A", "beta EDITED"), // changed
    (4L, "B", "delta"),       // added (3 removed)
    (5L, "B", null.asInstanceOf[String]) // unchanged (null == null)
  ).toDF("id", "grp", "text")

  test("diffStatus classifies added/removed/changed/unchanged; null payloads compare equal") {
    val got = SnapshotDiff.diffStatus(oldSnap, newSnap, "id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added", 5L -> "unchanged"))
  }

  test("null is distinct from the empty string and from any literal") {
    val o = Seq((1L, "x"), (2L, ""), (3L, " ")).toDF("id", "text")
    val n = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]), (3L, " ")).toDF("id", "text")
    val got = SnapshotDiff.diffStatus(o, n, "id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "changed") // value → null is a change
    assert(got(2L) === "changed") // "" → null is a change
    assert(got(3L) === "unchanged")
  }

  test("multi-column hash keeps column boundaries: (ab, c) != (a, bc)") {
    val o = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val n = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val got = SnapshotDiff.diffStatus(o, n, "id", Seq("x", "y"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "changed")
  }

  test("summary groups by the new side's group when present, old side for removed rows") {
    val o = Seq((1L, "A", "t"), (3L, "B", "u")).toDF("id", "grp", "text")
    val n = Seq((1L, "C", "t")).toDF("id", "grp", "text") // id 1 migrated A→C
    val got = SnapshotDiff.summary(o, n, "id", "grp", Seq("text"))
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("B", "removed", 1L), ("C", "unchanged", 1L)))
  }
}
