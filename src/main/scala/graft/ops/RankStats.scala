package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based exact statistics: Spearman correlation and rank-sum AUC.
  *
  * Both are computed on DETERMINISTIC ranks — `row_number()` ordered by
  * `(value, id)` — i.e. a permutation with ties broken by the unique id
  * rather than mid-rank averaging. That makes every intermediate an exact
  * integer (cross-engine bit-identical) at the cost of a documented,
  * reproducible tie convention; with continuous-ish inputs the two
  * conventions agree to noise.
  *
  * Scale shape: one hash aggregation to the per-entity relation, then a
  * global rank window over that BOUNDED relation (n_entities rows, not
  * n_facts) — on a cluster the same rank comes from a range-partitioned
  * sort, and the final readout is a single-row aggregate. Sums are
  * decimal(38,0): rank products reach n³, past long range at 10⁹ entities.
  * Signed ratios round half-away via the CASE-guarded integral divide so
  * Spark `div` (truncate toward zero) and DuckDB `//` (floor) agree.
  */
object RankStats {

  private val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  /** Spearman rank correlation between two per-entity measures.
    *
    * Because deterministic ranks form a permutation of 1..n, the marginal
    * rank sums are closed forms and the whole estimate reduces to the
    * rational `rho = (12·Σ rx·ry − 3·n·(n+1)²) / (n³ − n)` — no sqrt, no
    * doubles until the final 6-dp half-away rounding.
    *
    * Input: one row per entity with integer measure columns `xCol`, `yCol`
    * and unique tie-break column `idCol`. Output: single row
    * `(n, spearman_rho)`.
    */
  def spearman(perEntity: DataFrame, idCol: String, xCol: String, yCol: String): DataFrame = {
    val wx = Window.orderBy(col(xCol), col(idCol))
    val wy = Window.orderBy(col(yCol), col(idCol))
    perEntity
      .withColumn("_rx", row_number().over(wx).cast("long"))
      .withColumn("_ry", row_number().over(wy).cast("long"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_rx").cast(dec38) * col("_ry")).as("_sxy"))  // cast BEFORE: rank² wraps LONG past ~3e9 entities
      .withColumn("_nd", col("n").cast(dec38))
      .withColumn("_num",
        lit(12) * col("_sxy") - lit(3) * col("_nd") * (col("_nd") + 1) * (col("_nd") + 1))
      .withColumn("_den", col("_nd") * col("_nd") * col("_nd") - col("_nd"))
      .select(
        col("n"),
        (expr("""CASE WHEN _num >= 0
                |  THEN (2 * _num * 1000000 + _den) div (2 * _den)
                |  ELSE -((2 * -_num * 1000000 + _den) div (2 * _den)) END""".stripMargin)
          .cast("double") / 1000000.0).as("spearman_rho"))
  }

  /** Rank-sum (Mann-Whitney) AUC of `scoreCol` predicting `labelCol`
    * (1 = positive): `AUC = (Σ ranks₊ − P(P+1)/2) / (P·N)` with ranks
    * ascending by `(score, id)`. The rank sum of positives is always
    * ≥ P(P+1)/2, so the numerator is non-negative and the plain half-away
    * integral divide applies. Output: single row `(n_pos, n_neg, auc)`.
    */
  def auc(scored: DataFrame, idCol: String, scoreCol: String, labelCol: String): DataFrame = {
    val w = Window.orderBy(col(scoreCol), col(idCol))
    scored
      .withColumn("_r", row_number().over(w).cast("long"))
      .agg(
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("n_neg"),
        sum(when(col(labelCol) === 1, col("_r")).otherwise(0L).cast(dec38)).as("_rs"))
      // doubled numerator/denominator keep everything integral:
      // AUC = (2·Σr₊ − P(P+1)) / (2·P·N)
      .withColumn("_num",
        lit(2) * col("_rs") - col("n_pos").cast(dec38) * (col("n_pos").cast(dec38) + 1))
      .withColumn("_den", lit(2) * col("n_pos").cast(dec38) * col("n_neg").cast(dec38))
      .select(
        col("n_pos"), col("n_neg"),
        (expr("(2 * _num * 1000000 + _den) div (2 * _den)")
          .cast("double") / 1000000.0).as("auc"))
  }
}
