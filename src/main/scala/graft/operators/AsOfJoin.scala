package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row of the same
  * key with `rightTime <= leftTime` (SURVEY.md §2.3: absent from the
  * reference and from Spark's built-in operators).
  *
  * Implementation is the scale-correct union form: tag both sides, sort
  * per key by (time, side, rightId) — right rows first on timestamp ties —
  * and carry the latest right payload forward with an ignore-nulls
  * `last()` over an unbounded-preceding ROWS frame. Cost is one shuffle +
  * sort over |L|+|R| rows; a range-predicate join would explode to the
  * per-key product before filtering. Mirrored 1:1 by DuckDB
  * `last_value(x IGNORE NULLS)` in the oracle.
  */
object AsOfJoin {

  /** `left` and `right` must share `key` and `timeCol`; their other column
    * names must be disjoint. Right-side `rightIdCol` (unique per row) is
    * the deterministic tie-break and is carried as `asof_<rightIdCol>`
    * along with `asof_<c>` for each payload column — null when no right
    * row is at or before the left row's time.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      timeCol: String,
      rightIdCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols  = left.columns.filterNot(c => c == key || c == timeCol).toSeq
    val carryCols = rightIdCol +: payload
    val l = left.select(
      Seq(col(key), col(timeCol), lit(1).as("_side")) ++
        leftCols.map(col) ++
        carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right.select(
      Seq(col(key), col(timeCol), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        carryCols.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(timeCol), col("_side"), col(s"_r_$rightIdCol"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carryCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 1)
      .drop("_side")
      .drop(carryCols.map(c => s"_r_$c"): _*)
  }
}
