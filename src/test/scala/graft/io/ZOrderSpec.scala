package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave matches a reference Morton implementation") {
    def morton(a: Int, b: Int, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits)
        z |= (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))
      z
    }
    val pairs = for (a <- 0 to 7; b <- 0 to 7) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave(col("a"), col("b"), 3).as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === morton(a, b, 3), s"($a,$b)") }
  }

  test("z-ordered write produces files with disjoint z-ranges and small 2-D rectangles") {
    val tmp = Files.createTempDirectory("graft_zorder").toString
    // a 64x64 grid — every (x, y) cell once
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    ZOrder.writeZOrdered(grid, tmp, "x", "y", numFiles = 16, bits = 6)

    val raw = spark.read.parquet(tmp)
    // same normalization the writer used (min/max re-derived from the data)
    val back = raw
      .withColumn("f", input_file_name())
      .withColumn("z", ZOrder.zvalue(raw, "x", "y", 6))
    // files cover DISJOINT z-ranges (the property parquet min/max skipping needs)
    val ranges = back.groupBy("f")
      .agg(min("z").as("lo"), max("z").as("hi"),
        (max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1, _, _), (lo2, _, _, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // each file's bounding rectangle is FAR smaller than the full grid on
    // both axes (a plain sort by x would give dy = 63 for every file)
    ranges.foreach { case (_, _, dx, dy) =>
      assert(dx <= 32 && dy <= 32, s"file rectangle $dx x $dy too wide")
    }
    // nothing lost
    assert(back.count() === 64L * 64L)
  }
}
