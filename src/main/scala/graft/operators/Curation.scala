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

  /** Keeper-policy comparison: cluster-based dedup always keeps ONE doc
    * per component, but WHICH one is a policy choice — min-id (stable,
    * reproducible) vs highest-quality (keeps the best copy; ties → smaller
    * id). The per-`groupCol` survivor counts differ whenever a cluster
    * spans groups, and that shift is exactly what this reports: how much
    * the keeper policy redistributes the surviving mix across sources.
    *
    * Scale shape: one CC labeling ([[Dedup.minhashCandidates]] →
    * [[ConnectedComponents.labels]]), one join of the label relation to
    * per-doc quality, one per-cluster argmax as `max(struct)` (hash agg,
    * no window over the corpus), two anti-join-free LEFT joins of the
    * bounded loser sets back to the corpus rolled into one conditional
    * aggregation.
    */
  def keeperPolicyComparison(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String): DataFrame = {
    val quality = TextFunctions.withQualityColumns(docs, textCol)
      .select(col(idCol).as("node"), col("quality"))
    val labeled = graft.operators.ConnectedComponents
      .labels(Dedup.minhashCandidates(docs, idCol, textCol).select("doc_a", "doc_b"),
        "doc_a", "doc_b")
      .join(quality, "node")
    val keepers = labeled
      .groupBy("cluster_id")
      .agg(max(struct(col("quality"), (-col("node")).as("neg"), col("node").as("n"))).as("bq"))
      .select(col("cluster_id"), col("bq.n").as("k_quality"))
    val losers = labeled
      .join(keepers, "cluster_id")
      .select(
        col("node"),
        (col("node") =!= col("cluster_id")).as("lose_minid"),
        (col("node") =!= col("k_quality")).as("lose_quality"))
    docs
      .select(col(groupCol), col(idCol).as("node"))
      .join(losers, Seq("node"), "left")
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(coalesce(col("lose_minid"), lit(false)), 0L).otherwise(1L)).as("n_kept_minid"),
        sum(when(coalesce(col("lose_quality"), lit(false)), 0L).otherwise(1L)).as("n_kept_quality"))
      .orderBy(groupCol)
  }
}
