package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Descriptive-statistics operators from the reference notebook
  * (`data_analysis.ipynb` cells 10-17; SURVEY.md §2.6 A1-A9).
  *
  * All exact (no approx sketches) so they hash-match the DuckDB oracle; all
  * single-pass hash aggregations (partial + final) — `.explain` shows
  * `HashAggregate` pairs around one exchange.
  */
object Stats {

  /** A1/A2/A5/A6 — the notebook's `munge_data` summary: row count, distinct
    * classes, min/max/median of a derived length. The reference names the
    * median "mean" (`mean_seq_length`); we keep honest names.
    * `percentile(_, 0.5)` is exact + interpolating, matching pandas
    * `.median()` and DuckDB `median`.
    */
  def summary(df: DataFrame, classCol: String, textCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(classCol)).as("n_classes"),
      min(length(col(textCol))).cast("long").as("min_len"),
      max(length(col(textCol))).cast("long").as("max_len"),
      round(expr(s"percentile(length(`$textCol`), 0.5D)"), 6).as("median_len"))

  /** A3/A7 — value_counts: group count, descending, deterministic tie-break. */
  def valueCounts(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc(keyCol))

  /** A4 — min/max/mean of group sizes (agg-of-agg). */
  def groupSizeStats(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .agg(
        min(col("n")).as("min_size"),
        max(col("n")).as("max_size"),
        round(avg(col("n")), 6).as("avg_size"))

  /** A8 — histogram of group sizes: for each size, how many groups have it. */
  def groupSizeHistogram(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("grp_size"))
      .groupBy(col("grp_size"))
      .agg(count(lit(1)).as("n_groups"))
      .orderBy(col("grp_size"))

  /** A9 — frequency distribution of a derived length (F1). */
  def lengthFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(length(col(textCol)).cast("long").as("len"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("len"))
}
