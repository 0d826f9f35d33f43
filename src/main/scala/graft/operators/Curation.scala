package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** End-to-end corpus curation funnel — the composition the individual
  * operators exist for: quality-score filter, then cluster-based
  * MinHash/LSH near-dup removal on the surviving set (one keeper per
  * connected component — see Dedup.clusterLosers for why pair-wise
  * dropping is wrong), reported as per-group stage counts
  * (input → quality-pass → final). Every stage is the already-verified
  * operator; this adds only composition.
  */
object Curation {

  def funnel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      qualityThreshold: Double): DataFrame = {
    val passing = TextFunctions.withQualityColumns(docs, textCol)
      .filter(col("quality") >= qualityThreshold)
      .select(col(idCol), col(groupCol), col(textCol))
    val losers = Dedup.clusterLosers(
      Dedup.minhashCandidates(passing, idCol, textCol).select("doc_a", "doc_b"))
      .select(col("node").as(idCol))
    // no broadcast hint — loser set is unbounded at scale; AQE still
    // broadcasts when it is actually small (see Dedup.survivorsFromPairs)
    val fin = passing.join(losers, Seq(idCol), "left_anti")

    // input and quality-pass counts fold into ONE conditional aggregation
    // over a single corpus scan (separate groupBys would scan docs twice);
    // only the post-dedup count needs the second pass, which the dedup
    // pipeline itself pays for.
    val inputQ = TextFunctions.withQualityColumns(docs, textCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_input"),
        sum(when(col("quality") >= qualityThreshold, 1L).otherwise(0L)).as("n_quality"))
    val fc = fin.groupBy(col(groupCol)).agg(count(lit(1)).as("n_final"))
    inputQ
      .join(fc, Seq(groupCol), "left")
      .select(
        col(groupCol),
        col("n_input"),
        col("n_quality"),
        coalesce(col("n_final"), lit(0L)).as("n_final"))
      .orderBy(col(groupCol))
  }
}
