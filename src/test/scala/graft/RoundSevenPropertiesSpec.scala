package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TheilSen

/** Round-7 analytic pins — properties the oracle equivalence can't see
  * (it proves Spark ≡ DuckDB on the same formula, not that the formula
  * has the statistical behavior it claims).
  */
class RoundSevenPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sampled Theil–Sen recovers the exact slope on clean linear data") {
    // y = 3x (cents): every pair slope is exactly 3000 milli
    val df = (1 to 200).map(i => ("g", i.toLong, 3L * i, i.toLong))
      .toDF("g", "x", "y", "k")
    val r = TheilSen.sampledSlopeMilli(df, "g", col("x"), col("y"), col("k"))
      .head()
    assert(r.getAs[Long]("median_slope_milli") === 3000L)
    // 200 distinct x values sampled down to 64 distinct → all C(64,2) pairs
    assert(r.getAs[Long]("n_pairs") === 64L * 63 / 2)
  }

  test("sampled Theil–Sen is untouched by 10% gross outliers (breakdown property)") {
    // corrupt every 10th point to a constant y = 1e9: outlier–outlier
    // pairs slope to 0 and clean–outlier pairs explode, but clean–clean
    // pairs stay the strict majority of the sample's pairs, so the
    // median is still the true slope — OLS under the same corruption
    // is off by orders of magnitude
    val df = (1 to 200).map { i =>
      val y = if (i % 10 == 0) 1000000000L else 3L * i
      ("g", i.toLong, y, i.toLong)
    }.toDF("g", "x", "y", "k")
    val r = TheilSen.sampledSlopeMilli(df, "g", col("x"), col("y"), col("k"))
      .head()
    assert(r.getAs[Long]("median_slope_milli") === 3000L,
      s"outliers moved the sampled Theil–Sen median: ${r.mkString(",")}")
  }

  test("sampled Theil–Sen pair count is capped by k²/2 regardless of group size") {
    // 5000-row group, k = 16 → at most C(16,2) = 120 pairs: the whole
    // point of the sampled variant's 100 TB posture
    val df = (1 to 5000).map(i => ("g", (i % 97).toLong, i.toLong, i.toLong))
      .toDF("g", "x", "y", "k")
    val r = TheilSen.sampledSlopeMilli(df, "g", col("x"), col("y"), col("k"), k = 16)
      .head()
    assert(r.getAs[Long]("n_pairs") <= 16L * 15 / 2)
    assert(r.getAs[Long]("n_pairs") >= 1L)
  }

  test("sampled Theil–Sen sample is deterministic: same seed ⇒ same result, new seed ⇒ same clean slope") {
    val df = (1 to 300).map(i => ("g", i.toLong, 3L * i + 7, i.toLong))
      .toDF("g", "x", "y", "k")
    val a = TheilSen.sampledSlopeMilli(df, "g", col("x"), col("y"), col("k")).head()
    val b = TheilSen.sampledSlopeMilli(df, "g", col("x"), col("y"), col("k")).head()
    assert(a.toSeq === b.toSeq, "same seed must replay the identical sample")
    val c = TheilSen.sampledSlopeMilli(df, "g", col("x"), col("y"), col("k"),
      seed = "other").head()
    assert(c.getAs[Long]("median_slope_milli") === 3000L,
      "an independent sample must still recover the clean slope")
  }

  test("media decode: BMP/WAV round-trip through make → decode is the identity on metadata") {
    for (w <- Seq(1, 255, 256, 511, 65535); h <- Seq(1, 499)) {
      val (_, dw, dh, df_) = graft.operators.Multimodal.decode(
        graft.operators.Multimodal.makeBmp(w, h))
      assert((dw, dh, df_) === ((w, h, 1)), s"BMP $w x $h")
    }
    for (rate <- Seq(8000, 44100); frames <- Seq(0, 1, 49)) {
      val (nb, dw, dh, df_) = graft.operators.Multimodal.decode(
        graft.operators.Multimodal.makeWav(rate, 2, frames))
      assert((nb, dw, dh, df_) === ((44L + frames * 4, rate, 2, frames)),
        s"WAV $rate/$frames")
    }
  }
}
