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
  * and carry the latest right row forward as ONE struct with a single
  * ignore-nulls `last()` over an unbounded-preceding ROWS frame. The
  * struct is what makes the result a true row: per-column carries would
  * stitch values from DIFFERENT right rows whenever a payload value is
  * null (the newest id next to an older row's value). Cost is one
  * shuffle + sort over |L|+|R| rows; a range-predicate join would explode
  * to the per-key product before filtering. Mirrored 1:1 by DuckDB
  * `last_value(struct_pack(...) IGNORE NULLS)` in the oracle.
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
    val structT   = org.apache.spark.sql.types.StructType(carryCols.map(c => right.schema(c)))
    val l = left.select(
      Seq(col(key), col(timeCol), lit(1).as("_side"), lit(null).cast(structT).as("_r")) ++
        leftCols.map(col): _*)
    val r = right.select(
      Seq(col(key), col(timeCol), lit(0).as("_side"),
        struct(carryCols.map(col): _*).as("_r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(timeCol), col("_side"), col("_r").getField(rightIdCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        Seq(col(key), col(timeCol)) ++ leftCols.map(col) ++
          carryCols.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }
}
