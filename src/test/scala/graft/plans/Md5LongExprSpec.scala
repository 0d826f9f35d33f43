package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r12 optimization guard: the digest-bytes Md5LongExpr is bit-for-bit the
  * built-in `conv(substring(md5(c), 1, n), 16, 10)` chain it replaced (the
  * form every DuckDB oracle replays), for every prefix width in use and
  * for empty / unicode / long inputs; nulls stay null.
  */
class Md5LongExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Md5LongExpr == conv(substring(md5)) for n = 1..15 over varied strings") {
    import spark.implicits._
    val df = (Seq("", "a", "hello world", "samp#1234", "日本語テキスト",
      "x" * 10000, "tab\tand\nnewline", "0") ++
      (1 to 200).map(i => s"doc#$i-" + ("y" * (i % 37)))).toDF("s")
      .localCheckpoint()
    (1 to 15).foreach { n =>
      val bad = df.select(
          Md5LongExpr(col("s"), n).as("fast"),
          conv(substring(md5(col("s")), 1, n), 16, 10).cast("long").as("ref"))
        .filter(col("fast") =!= col("ref") || col("fast").isNull)
        .count()
      assert(bad === 0, s"n=$n")
    }
  }

  test("null input stays null") {
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("a")).toDF("s")
      .select(Md5LongExpr(col("s"), 12).as("h")).collect()
    assert(r.count(_.isNullAt(0)) === 1)
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    import spark.implicits._
    val withCodegenOff = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val bad = Seq("a", "bb", "ccc").toDF("s")
        .select(Md5LongExpr(col("s"), 12).as("fast"),
          conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(bad === 0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", withCodegenOff)
  }
}
