package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Row/column hygiene operators (SURVEY.md §2.2 P1-P7; reference
  * `preprocess_to_staging.py:120,155-157`, `process_to_curated.py:29,52-53`).
  * Thin, typed wrappers — Catalyst prunes/pushes these for free.
  */
object Clean {

  /** P1 — drop rows with any null across the given columns (all if empty). */
  def dropNa(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.na.drop("any") else df.na.drop("any", cols)

  /** P2/P3 — drop columns. */
  def dropCols(df: DataFrame, cols: String*): DataFrame = df.drop(cols: _*)

  /** P4 — analysis-time schema assertion (reference raises KeyError). */
  def requireColumns(df: DataFrame, cols: String*): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required column(s): ${missing.mkString(", ")}")
    df
  }

  /** P7 — preview. Deterministic only after an orderBy; kept for API parity. */
  def preview(df: DataFrame, n: Int = 5): DataFrame = df.limit(n)
}
