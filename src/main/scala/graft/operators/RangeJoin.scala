package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via bucketing — the third join the brief
  * names that Spark's planner has no native operator for (a raw range
  * predicate plans as a nested-loop join).
  *
  * Intervals are exploded into the fixed-width buckets they cover; points
  * carry their single bucket; an equi-join on (key, bucket) bounds the
  * candidate set, and the exact BETWEEN predicate refines it. Cost is
  * |points| + Σ interval-spans/bucketWidth join rows instead of the
  * per-key cross product. A point's one bucket meets each interval at most
  * once, so no dedup is needed.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    val b = intervals.withColumn(
      "_b",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val p = points.withColumn("_b", floor(col(pointCol) / bucketWidth).cast("long"))
    p.join(b, Seq(key, "_b"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("_b")
  }
}
