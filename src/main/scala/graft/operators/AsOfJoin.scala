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

  /** Nearest-in-time join — for each left row, the right row of the same
    * key minimizing |Δt|, looking BOTH ways (the sensor-alignment /
    * "closest reading" variant; [[asOf]] is backward-only). Same union
    * form, ONE shuffle: the backward carry is `last(ignoreNulls)` over
    * unbounded-preceding (covers Δt ≤ 0, right rows sort before left on
    * timestamp ties so an equal-time right counts as backward), the
    * forward carry is `first(ignoreNulls)` over unbounded-following
    * (strictly-later rights only — equal-time rows sit before the left
    * row in sort order and are already the backward side's). Ties in
    * |Δt| resolve to the EARLIER right row, deterministically.
    *
    * Left times are compared in microseconds; output carries the chosen
    * right id, the absolute gap, and which direction won.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      timeCol: String,
      leftIdCol: String,
      rightIdCol: String): DataFrame = {
    val structT = org.apache.spark.sql.types.StructType(
      Seq(right.schema(rightIdCol), right.schema(timeCol).copy(name = "_t")))
    val l = left.select(
      col(key), col(timeCol), lit(1).as("_side"),
      col(leftIdCol).as("_lid"), lit(null).cast(structT).as("_r"))
    val r = right.select(
      col(key), col(timeCol), lit(0).as("_side"),
      lit(null).cast(left.schema(leftIdCol).dataType).as("_lid"),
      struct(col(rightIdCol), col(timeCol).as("_t")).as("_r"))
    val ord = Window.partitionBy(key)
      .orderBy(col(timeCol), col("_side"), col("_r").getField(rightIdCol))
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd  = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val us  = unix_micros(col(timeCol))
    val bUs = unix_micros(col("_b").getField("_t"))
    val fUs = unix_micros(col("_f").getField("_t"))
    val db  = us - bUs // ≥ 0 when present
    val df  = fUs - us // > 0 when present
    val pickBack = col("_f").isNull || (col("_b").isNotNull && db <= df)
    l.unionByName(r)
      .withColumn("_b", last(col("_r"), ignoreNulls = true).over(wBack))
      .withColumn("_f", first(col("_r"), ignoreNulls = true).over(wFwd))
      .filter(col("_side") === 1)
      .select(
        col(key), col("_lid").as(leftIdCol), col(timeCol),
        when(col("_b").isNull && col("_f").isNull,
          lit(null).cast(right.schema(rightIdCol).dataType))
          .when(pickBack, col("_b").getField(rightIdCol))
          .otherwise(col("_f").getField(rightIdCol)).as(s"nearest_$rightIdCol"),
        when(col("_b").isNull && col("_f").isNull, lit(null).cast("long"))
          .when(pickBack, db).otherwise(df).as("gap_us"),
        when(col("_b").isNull && col("_f").isNull, lit("none"))
          .when(pickBack, lit("past")).otherwise(lit("future")).as("direction"))
  }
}
