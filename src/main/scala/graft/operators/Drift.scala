package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift diagnostics: the Kolmogorov–Smirnov two-sample
  * statistic and the Population Stability Index — the two readouts a data
  * team checks before concluding "this month's corpus looks like last
  * month's".
  *
  * Determinism: KS is pure integer arithmetic (cross-multiplied cumulative
  * counts, no division until the final half-away micro rounding); PSI
  * follows the q72/q111 ln discipline — ln of an exact double ratio of
  * integers, each term quantized to a 1e-9 integer BEFORE summing, so the
  * sum is order-independent (integer addition commutes; double addition
  * does not).
  *
  * Scale shape: both reduce to one hash aggregation on the value/category
  * key. KS then needs ONE global cumulative window over the DISTINCT-value
  * relation (bounded by value cardinality, not row count; range-partitioned
  * sort on a cluster). PSI's category relation is tiny by construction.
  */
object Drift {

  private val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  /** Two-sample KS statistic `D = max_v |F_a(v) − F_b(v)|` between the
    * rows where `groupCol` = `a` and those where it = `b`, over integer
    * `valueCol`. Cross-multiplied form: `max |cumA·nB − cumB·nA| / (nA·nB)`
    * — exact until the single final division. Output: single row
    * `(n_a, n_b, ks)`.
    */
  def ksStatistic(df: DataFrame, valueCol: String, groupCol: String,
                  a: String, b: String): DataFrame = {
    val perValue = df
      .filter(col(groupCol).isin(a, b))
      .groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("cb"))
    val wCum = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy() // one global partition, whole-frame totals
    perValue
      .withColumn("cuma", sum(col("ca")).over(wCum).cast(dec38))
      .withColumn("cumb", sum(col("cb")).over(wCum).cast(dec38))
      .withColumn("na", sum(col("ca")).over(wTot).cast(dec38))
      .withColumn("nb", sum(col("cb")).over(wTot).cast(dec38))
      .agg(
        max(col("na")).cast("long").as("n_a"),
        max(col("nb")).cast("long").as("n_b"),
        max(abs(col("cuma") * col("nb") - col("cumb") * col("na"))).as("_d"))
      .withColumn("_den", col("n_a").cast(dec38) * col("n_b").cast(dec38))
      .select(
        col("n_a"), col("n_b"),
        (expr("(2 * _d * 1000000 + _den) div (2 * _den)")
          .cast("double") / 1000000.0).as("ks"))
  }

  /** Population Stability Index per category between two cohorts:
    * `PSI = Σ_c (p_c − q_c)·ln(p_c / q_c)` with add-one (Laplace)
    * smoothing over the `k` observed categories so empty cells stay
    * finite: `p_c = (cnt_a(c)+1)/(n_a+k)`. Emits the per-category
    * contribution (nano-quantized, then 6-dp) plus the cohort counts —
    * the table a reviewer reads to see WHICH category moved. Output:
    * one row per category, ordered.
    */
  def psi(df: DataFrame, catCol: String, groupCol: String,
          a: String, b: String): DataFrame = {
    val perCat = df
      .filter(col(groupCol).isin(a, b))
      .groupBy(col(catCol).as("category"))
      .agg(
        sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("n_b"))
    perCat
      .withColumn("ta", sum(col("n_a")).over() + count(lit(1)).over())
      .withColumn("tb", sum(col("n_b")).over() + count(lit(1)).over())
      // p, q are exact double ratios of integers — identical IEEE ops on
      // both engines; the ln result is nano-quantized per term
      .withColumn("_p", (col("n_a") + 1).cast("double") / col("ta").cast("double"))
      .withColumn("_q", (col("n_b") + 1).cast("double") / col("tb").cast("double"))
      .withColumn("_t",
        round((col("_p") - col("_q")) * log(col("_p") / col("_q")) * 1000000000, 0).cast("long"))
      .select(
        col("category"), col("n_a"), col("n_b"),
        round(col("_t").cast("double") / 1000000000.0, 6).as("psi_term"))
      .orderBy("category")
  }
}
