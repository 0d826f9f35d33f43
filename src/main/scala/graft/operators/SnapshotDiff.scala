package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two corpus versions — the CDC readout of a
  * versioned data lake (reference context: the DVC-tracked stage outputs,
  * `/root/reference/dvc.yaml:1-18`, version whole zones; this operator is
  * the row-level "what changed between version N and N+1" a Spark-native
  * lake answers directly instead of re-materializing both).
  *
  * Shape: content-hash both sides (md5 over the payload columns — one
  * skinny (id, hash) relation per snapshot, built in the scan projection),
  * full-outer equi-join on the id, classify each id as
  * added / removed / changed / unchanged. ONE shuffle per side, keyed by
  * id; on bucketed snapshot stores ([[graft.io.Bucketing]] discipline) the
  * join is co-located and shuffle-free, which is what makes a daily diff
  * over a 100 TB lake an incremental cost, not a re-read of both copies.
  * The hash comparison never moves the payload — only 32-byte digests
  * shuffle.
  */
object SnapshotDiff {

  /** (id, change_status) for every id present in either snapshot.
    * `hashCols` are the payload columns whose concatenated md5 defines
    * "changed" (null-safe: each column contributes its null-ness flag AND
    * its value, so null ≠ '' ≠ any literal; the `#` separator keeps
    * ("ab","c") ≠ ("a","bc")).
    */
  def diffStatus(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      hashCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, hc: String) = df.select(
      col(idCol),
      md5(concat_ws("#", hashCols.flatMap(c => Seq(
        col(c).isNull.cast("string"),
        coalesce(col(c).cast("string"), lit("")))): _*))
        .as(hc))
    hashed(oldSnap, "h_old")
      .join(hashed(newSnap, "h_new"), Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") =!= col("h_new"), lit("changed"))
          .otherwise(lit("unchanged"))
          .as("change_status"))
  }

  /** [[diffStatus]] rolled up per `groupCol` (taken from whichever side
    * has the row — new wins for ids in both). Output is bounded:
    * |groups| × 4 rows.
    */
  def summary(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      groupCol: String,
      hashCols: Seq[String]): DataFrame = {
    val grp = newSnap.select(col(idCol), col(groupCol).as("_gn"))
      .join(oldSnap.select(col(idCol), col(groupCol).as("_go")), Seq(idCol), "full_outer")
      .select(col(idCol), coalesce(col("_gn"), col("_go")).as(groupCol))
    diffStatus(oldSnap, newSnap, idCol, hashCols)
      .join(grp, idCol)
      .groupBy(groupCol, "change_status")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(groupCol, "change_status")
  }
}
