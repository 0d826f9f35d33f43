package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq((1L, "alpha", 250L), (2L, "beta", -75L), (3L, "gamma", 0L))

  test("fingerprint is order- and partitioning-invariant") {
    val a = Fingerprint.of(
      rows.toDF("id", "name", "cents").coalesce(1),
      "t", Seq(col("id"), col("name"), col("cents")))
    val b = Fingerprint.of(
      rows.reverse.toDF("id", "name", "cents").repartition(7),
      "t", Seq(col("id"), col("name"), col("cents")))
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  test("fingerprint detects a single changed cell and a duplicated row") {
    val base = Fingerprint.of(
      rows.toDF("id", "name", "cents"), "t",
      Seq(col("id"), col("name"), col("cents"))).collect().head
    val changed = Fingerprint.of(
      Seq((1L, "alpha", 251L), (2L, "beta", -75L), (3L, "gamma", 0L))
        .toDF("id", "name", "cents"),
      "t", Seq(col("id"), col("name"), col("cents"))).collect().head
    assert(base.getLong(2) !== changed.getLong(2)) // xor differs
    // duplicated row: xor cancels the pair, but count + modular sum catch it
    val duped = Fingerprint.of(
      (rows ++ Seq(rows.head, rows.head)).toDF("id", "name", "cents"),
      "t", Seq(col("id"), col("name"), col("cents"))).collect().head
    assert(duped.getLong(1) === 5L)
    assert(base.getLong(2) === duped.getLong(2)) // xor is blind to even multiplicity...
    assert(base.getLong(3) !== duped.getLong(3)) // ...the modular sum is not
  }

  test("ofAll emits one row per table in name order") {
    val out = Fingerprint.ofAll(Seq(
      ("b_tbl", rows.toDF("id", "name", "cents"), Seq(col("id"))),
      ("a_tbl", rows.toDF("id", "name", "cents"), Seq(col("name")))))
      .select("table_name").as[String].collect()
    assert(out.toSeq === Seq("a_tbl", "b_tbl"))
  }
}
