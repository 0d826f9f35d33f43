package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverse-frequency class weights (reference: `preprocess_to_staging.py:170-190`,
  * SURVEY.md §2.6 A10).
  *
  * The reference computes w = 1/counts, normalizes by sum, then rescales by
  * 1/max — which collapses algebraically to the closed form
  * `w_c = n_min / n_c` (n_min = smallest class count). We compute the closed
  * form; `ClassWeightsSpec` proves equivalence with the literal 3-step
  * normalize. Classes absent from `train` are absent from the output.
  *
  * Scale: one hash aggregation over the fact table; the 1-row global min is
  * broadcast back (no single-partition window over data).
  */
object ClassWeights {
  def weights(train: DataFrame, classCol: String): DataFrame =
    weightsFromCounts(
      train.groupBy(col(classCol)).agg(count(lit(1)).as("n_c")), classCol, "n_c")

  /** Closed form over precomputed per-class counts (e.g. from
    * `StratifiedSplit.splitSizes` — avoids materializing the split rows).
    */
  def weightsFromCounts(counts: DataFrame, classCol: String, countCol: String): DataFrame = {
    val nMin = counts.agg(min(col(countCol)).as("n_min"))
    counts
      .crossJoin(broadcast(nMin))
      .select(
        col(classCol),
        round(col("n_min").cast("double") / col(countCol), 6).as("weight"))
      .orderBy(col(classCol))
  }

  /** The reference's literal 3-step computation (for the equivalence test):
    * w = 1/n_c; w /= sum(w); w *= 1/max(w).
    */
  def weightsLiteral(train: DataFrame, classCol: String): DataFrame = {
    val counts = train.groupBy(col(classCol)).agg(count(lit(1)).as("n_c"))
    val inv    = counts.withColumn("w", lit(1.0) / col("n_c"))
    val stats  = inv.agg(sum(col("w")).as("w_sum"), max(col("w")).as("w_max"))
    inv
      .crossJoin(broadcast(stats))
      .select(
        col(classCol),
        round(col("w") / col("w_sum") / (col("w_max") / col("w_sum")), 6).as("weight"))
      .orderBy(col(classCol))
  }
}
