package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil–Sen robust slope, point-sampled for scale.
  *
  * The exact estimator medians ALL O(n²) pairwise slopes per group — the
  * right call when groups are dictionary-bounded (q235 keeps it), but a
  * scale-killer on fact-sized groups (~80 G pairs at 100×sf0.1). The
  * sampled variant keeps each group's `k` lowest md5-ranked POINTS and
  * medians their pair slopes: ≤ k²/2 pairs per group NO MATTER the group
  * size, and the sample is md5-deterministic so an external oracle replays
  * it bit-for-bit (no tolerance gate needed).
  *
  * Estimator properties (pinned in RoundSevenPropertiesSpec): slopes are
  * half-away-rounded milli integers with a sign split so truncating
  * division agrees across engines; the median is the lower median (rank
  * ⌈n/2⌉); with outlier fraction ε in the sample, the median pair slope is
  * untouched while clean pairs (1−ε)² stay the majority — the classic
  * 29.3% breakdown point, inherited by the sample.
  *
  * Plan shape: the sample is a per-group top-k (map-side WindowGroupLimit),
  * the pair join is a broadcast hash equi-join on the group key over the
  * ≤ k·|groups| sampled relation, and the median windows run over ≤ k²/2
  * rows per group.
  */
object TheilSen {

  /** @param df     input relation
    * @param g      group column name (slope per group)
    * @param x      x column (long)
    * @param y      y column (long; e.g. integer cents)
    * @param rowKey unique row key for the deterministic sample order
    * @param k      points kept per group
    * @param seed   md5 salt, so different callers draw independent samples
    * @return (g, n_pairs, median_slope_milli) — groups whose sample has no
    *         x-distinct pair (all sampled x equal) drop out, on any engine
    */
  def sampledSlopeMilli(
      df: DataFrame,
      g: String,
      x: Column,
      y: Column,
      rowKey: Column,
      k: Int = 64,
      seed: String = "ts634"): DataFrame = {
    val pts = df
      .select(col(g), x.cast("long").as("x"), y.cast("long").as("y"),
        rowKey.as("rk"))
      .withColumn("srn", row_number().over(Window.partitionBy(g)
        .orderBy(md5(concat_ws("#", lit(seed), col("rk"))), col("rk"))))
      .filter(col("srn") <= k)
      .select(col(g), col("x"), col("y"))
      // the sampled relation (≤ k·|groups| rows) feeds BOTH join sides
      .localCheckpoint(false)
    val pairs = pts.as("a")
      .join(broadcast(pts.as("b")),
        col(s"a.$g") === col(s"b.$g") && col("a.x") < col("b.x"))
      .select(col(s"a.$g").as(g),
        // half-away-rounded milli slope; the sign split keeps truncating
        // div semantics identical on Spark and DuckDB; the outer guard
        // covers speculative evaluation alongside the join residual
        expr("CASE WHEN (b.x - a.x) <= 0 THEN NULL" +
          " WHEN (b.y - a.y) >= 0" +
          " THEN (2 * (b.y - a.y) * 1000 + (b.x - a.x)) div (2 * (b.x - a.x))" +
          " ELSE -((2 * (a.y - b.y) * 1000 + (b.x - a.x)) div (2 * (b.x - a.x))) END")
          .as("slope_milli"))
    pairs
      .withColumn("rn", row_number()
        .over(Window.partitionBy(g).orderBy("slope_milli")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(g)))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .groupBy(g)
      .agg(max(col("n")).as("n_pairs"),
        min(col("slope_milli")).as("median_slope_milli"))
  }
}
