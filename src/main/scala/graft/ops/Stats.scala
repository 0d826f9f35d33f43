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

  /** Robust per-group outlier profile via median/MAD — the length-filter
    * calibration a curation pipeline runs before cutting "too short / too
    * long" docs (mean/stddev would let the outliers drag their own
    * threshold; median/MAD is breakdown-point-0.5 robust). A value is an
    * outlier when |x − median| > `cut`·MAD; with MAD = 0 (over half the
    * group identical) any deviation at all is flagged, which is the
    * convention that degrades gracefully instead of dividing by zero.
    *
    * Exactness: `valCol` is integer, so the interpolating median and MAD
    * land on exact .0/.5/.25 binary fractions and the `>` comparison is
    * deterministic across engines (`percentile` ≡ pandas/DuckDB
    * `quantile_cont`, the q01 parity). Scale shape: three passes over the
    * fact (median → deviation median → flag count), each a hash
    * aggregation with the tiny per-group stats relation BROADCAST back —
    * the exact-MAD lower bound (the flag threshold doesn't exist until
    * pass 2 ends). At 100 TB swap `percentile` for `approx_percentile`:
    * one sketch pass computes both quantiles and drops a scan.
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String, cut: Double = 3.0): DataFrame = {
    val med = df
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(`$valCol`, 0.5D)").as("med"))
    val dev = df
      .join(broadcast(med), groupCol)
      .withColumn("adev", abs(col(valCol).cast("double") - col("med")))
    val stats = dev
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        first(col("med")).as("_med"), // constant within the group
        expr("percentile(adev, 0.5D)").as("mad"))
      .select(
        col(groupCol),
        col("n_rows"),
        round(col("_med"), 6).as("median_val"),
        round(col("mad"), 6).as("mad"))
    dev
      .select(col(groupCol), col("adev"))
      .join(broadcast(stats), groupCol)
      .groupBy(col(groupCol), col("n_rows"), col("median_val"), col("mad"))
      .agg(sum(when(col("adev") > col("mad") * cut, 1L).otherwise(0L)).as("n_outliers"))
      .orderBy(groupCol)
  }

  /** Cumulative Poisson(1) probabilities scaled to 2^48 and floored to
    * exact integer thresholds, k = 0..8 — shared verbatim (same Scala
    * vals interpolated into the oracle SQL) so both engines draw the SAME
    * bootstrap weights. P(K > 8) ≈ 1.1e-6 maps to weight 9.
    */
  val PoissonCum48: Seq[Long] = {
    var p = math.exp(-1.0)
    var c = 0.0
    (0 to 8).map { k =>
      if (k > 0) p = p / k
      c += p
      math.floor(c * math.pow(2.0, 48)).toLong
    }
  }

  /** Poisson-bootstrap confidence interval for the per-group mean of
    * `valCol` — the uncertainty readout behind any corpus metric ("is
    * source A's mean length REALLY higher, or is that noise"). Classic
    * multinomial bootstrap resampling doesn't distribute (each replicate
    * needs a global draw); the Poisson(1) approximation makes each doc's
    * per-replicate weight an INDEPENDENT function of (doc, replicate) —
    * a pure map, which is why this is the standard bootstrap at scale.
    * Weights come from md5-uniform u(doc, b) against the exact integer
    * thresholds [[PoissonCum48]] — deterministic, engine-portable, and
    * reproducible run to run.
    *
    * Exactness: values quantize to 1e-6 integers; each replicate mean is
    * one double division of exact weighted sums; the CI is the exact
    * interpolating percentile over the `reps` replicate means (a
    * bounded-size set — the percentile buffers `reps` doubles, nothing
    * data-sized). Scale shape: one explode ×reps (map-side), one hash agg
    * keyed (group, replicate), then a per-group agg over reps rows.
    */
  def bootstrapMeanCI(
      df: DataFrame,
      valCol: String,
      idCol: String,
      groupCol: String,
      reps: Int = 32): DataFrame = {
    val u = graft.operators.Dedup.md5Long(
      concat(col(idCol).cast("string"), lit("#b"), col("b").cast("string")), 12)
    val w = PoissonCum48.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (t, k)) =>
        acc.when(u < t, k.toLong)
      }
      .otherwise(lit(9L))
    val byRep = df
      .select(
        col(groupCol),
        col(idCol),
        round(col(valCol).cast("double") * 1000000, 0).cast("long").as("_v6"),
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .select(col(groupCol), col("b"), col("_v6"), w.as("_w"))
      .groupBy(groupCol, "b")
      .agg(sum(col("_w") * col("_v6")).as("_swv"), sum(col("_w")).as("_sw"))
      .filter(col("_sw") > 0)
      .select(
        col(groupCol),
        (col("_swv").cast("double") / col("_sw") / 1000000.0).as("mean_b"))
    byRep
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_reps"),
        round(expr("percentile(mean_b, 0.025D)"), 6).as("ci_lo"),
        round(expr("percentile(mean_b, 0.975D)"), 6).as("ci_hi"))
      .orderBy(groupCol)
  }

  /** Winsorized mean per group: values clipped to the group's exact
    * interpolating [pLo, pHi] percentiles before averaging — the robust
    * central-tendency readout (a handful of megabyte documents shifts a
    * plain mean arbitrarily; the winsorized mean is bounded by
    * construction). Reported next to the raw mean so the gap itself is
    * the outlier signal.
    *
    * Exactness: clipped values quantize to 1e-6 integers BEFORE the sum
    * (each is either an exact integer·10⁶ or the rounded percentile —
    * per-row ops, engine-identical), so the aggregation is
    * order-invariant; the one double division happens after. Scale shape:
    * two hash aggregations over the group key + one broadcast join of the
    * |groups|-row percentile relation — `percentile` buffers each group's
    * values ON THE EXECUTOR for the exact interpolation (same cost the
    * q33 quantiles already pay; swap to `approx_percentile` when groups
    * stop fitting).
    */
  def winsorizedStats(
      df: DataFrame,
      valCol: String,
      groupCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    val pct = df
      .groupBy(groupCol)
      .agg(
        expr(s"percentile($valCol, ${pLo}D)").as("_plo"),
        expr(s"percentile($valCol, ${pHi}D)").as("_phi"))
    df
      .select(col(groupCol), col(valCol).cast("double").as("_v"))
      .join(broadcast(pct), groupCol)
      .select(
        col(groupCol),
        col("_plo"),
        col("_phi"),
        col("_v"),
        round(least(greatest(col("_v"), col("_plo")), col("_phi")) * 1000000, 0)
          .cast("long").as("_wq"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_rows"),
        round(first(col("_plo")), 6).as("p_lo"),
        round(first(col("_phi")), 6).as("p_hi"),
        sum(round(col("_v") * 1000000, 0).cast("long")).as("_sraw"),
        sum(col("_wq")).as("_sw"))
      .select(
        col(groupCol),
        col("n_rows"),
        col("p_lo"),
        col("p_hi"),
        round(col("_sraw").cast("double") / (col("n_rows") * 1000000.0), 6).as("raw_mean"),
        round(col("_sw").cast("double") / (col("n_rows") * 1000000.0), 6).as("winsorized_mean"))
      .orderBy(groupCol)
  }
}
