package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write clustering — the OSS equivalent of Delta's
  * `OPTIMIZE ZORDER BY (a, b)`: lay rows out along the interleaved-bit
  * curve of two columns so that parquet row-group min/max statistics
  * become selective on BOTH columns at once. A plain sort by `a` makes
  * skipping perfect on `a` and useless on `b`; the Z-curve gives every
  * file a small rectangle in (a, b) space, so predicates on either column
  * (or both) prune files — the difference between scanning 100 TB and
  * scanning the few GB a two-dimensional slice actually touches.
  *
  * Shape: one tiny min/max aggregate (4 values to the driver), a pure-map
  * z-value projection (fixed-point normalize each column to `bits` bits,
  * interleave with shifts/ors — codegen, no UDF), then
  * `repartitionByRange(zv).sortWithinPartitions(zv)` — the standard
  * total-order write: one range-exchange, files cover disjoint z-ranges.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative int columns:
    * result bit 2i is bit i of `a`, bit 2i+1 is bit i of `b`.
    */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i)
          .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
      }
      .reduce(_.bitwiseOR(_))
      .cast("long")
  }

  /** Fixed-point normalization of a numeric column onto [0, 2^bits): the
    * min/max come from one driver-side aggregate (two doubles per column —
    * bounded by construction, the same legitimacy as a broadcast dim).
    */
  private def normalized(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    val maxV = (1L << bits) - 1
    least(
      greatest(((c.cast("double") - lo) / span * maxV).cast("int"), lit(0)),
      lit(maxV.toInt))
  }

  /** The z-value column for `df`'s (colA, colB), normalized from their
    * actual ranges.
    */
  def zvalue(df: DataFrame, colA: String, colB: String, bits: Int = 16): Column = {
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    interleave(
      normalized(col(colA), r.getDouble(0), r.getDouble(1), bits),
      normalized(col(colB), r.getDouble(2), r.getDouble(3), bits),
      bits)
  }

  /** Write `df` z-ordered by (colA, colB) into `numFiles` parquet files
    * covering disjoint z-ranges.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      numFiles: Int,
      bits: Int = 16): Unit =
    df.withColumn("_zv", zvalue(df, colA, colB, bits))
      .repartitionByRange(numFiles, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_zv")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
}
