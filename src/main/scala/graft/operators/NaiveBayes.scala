package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the classic
  * weak-labeling / source-attribution primitive ("which source does
  * this doc read like"), trained on the corpus's own labels and read
  * out as a confusion matrix (ref: the quality/attribution stage of a
  * curation pipeline; complements q72's unigram-LM scoring and q84's
  * kNN vote).
  *
  * Exact-parity formulation: per-(token, label) log-probs with add-one
  * smoothing are quantized to 1e-6 integers (single `ln` + round per
  * term — bit-identical across engines), so every doc score is an
  * integer SUM and aggregation-order invariant. The zero-count
  * smoothing term is algebraically factored out — a doc's score under
  * label s is
  *
  *   n_words·lp0(s) + Σ_{w seen in s} n_dw·(lp(w,s) − lp0(s)) + prior(s)
  *
  * so the score join touches only OBSERVED (token, label) pairs (one
  * equi-join on token), never the |vocab|×|labels| grid. Label-level
  * constants (lp0, prior) are a bounded broadcast. The argmax is
  * `min(struct(−score, label))` — total order, ties to the
  * lexicographically smallest label, no window.
  */
object NaiveBayes {

  /** Confusion matrix (actual_label, pred_label, n_docs) of the
    * corpus classified by its own NB model.
    */
  def sourceAttribution(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(labelCol).as("actual"), col(textCol).as("text"))
    val words = base
      .select(col("doc_id"), col("actual"), explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
    // training counts DERIVE from dw (q72/q43 discipline), and dw feeds
    // FOUR consumers (lw, adjSum, nWords, and lw's own derivations) whose
    // plan subtrees diverge enough that exchange reuse never fires — the
    // un-checkpointed DAG re-scans and re-explodes the corpus 24 times.
    // A lazy localCheckpoint materializes the skinny per-doc count
    // relation once, executor-local (q138's pattern), and every consumer
    // reads the materialized blocks.
    val dw = words.groupBy("doc_id", "actual", "w").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
      // hash(doc_id) AFTER the checkpoint (a LogicalRDD reports
      // UnknownPartitioning): adjSum's (doc_id, actual, lbl) aggregate,
      // nWords' and best's doc_id aggregates are all satisfied by this
      // one clustering, so the doc-grain half of the plan runs on a
      // single reused exchange (guide §2.4). Partition count PINNED to
      // the session's shuffle parallelism: the advisory form's exchange
      // is only a few MB, so AQE (which sizes coalescing by bytes, blind
      // to downstream CPU) collapses every doc-grain aggregate onto one
      // core (r13: measured 4.6× on the q382 twin of this shape)
      .repartition(words.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id"))
    val lw = dw.groupBy(col("actual").as("lbl"), col("w")).agg(sum(col("n")).as("c"))
    val lt = lw.groupBy("lbl").agg(sum(col("c")).as("t"))
    val vocab = lw.select("w").distinct().agg(count(lit(1)).as("v"))
    val nDocs = base.groupBy(col("actual").as("lbl")).agg(count(lit(1)).as("nd"))
    // Σ per-label doc counts — same value as a fresh corpus count without
    // the extra scan branch
    val nTot = nDocs.agg(sum(col("nd")).as("ntot"))
    // per-label constants, micro-quantized (bounded: one row per label)
    val consts = lt.join(nDocs, "lbl").crossJoin(broadcast(vocab)).crossJoin(broadcast(nTot))
      .select(
        col("lbl"),
        round(log(lit(1.0) / (col("t") + col("v"))) * 1000000, 0).cast("long").as("lp0"),
        round(log(col("nd").cast("double") / col("ntot")) * 1000000, 0).cast("long").as("prior"),
        col("t"), col("v"))
    // observed-token adjustment term, joined on token only
    val lp = lw.join(broadcast(consts), "lbl")
      .select(
        col("lbl"), col("w"),
        (round(log((col("c") + 1).cast("double") / (col("t") + col("v"))) * 1000000, 0)
          .cast("long") - col("lp0")).as("adj"))
    // the vocab-bounded adjustment relation broadcasts into the doc-grain
    // side, so dw's hash(doc_id) clustering carries through every step
    val adjSum = dw.join(broadcast(lp), "w")
      .groupBy("doc_id", "actual", "lbl")
      .agg(sum(col("n") * col("adj")).as("s_adj"))
    val nWords = dw.groupBy("doc_id").agg(sum(col("n")).as("n_words"))
    // full score per (doc, label): every label's base term applies to
    // every doc, so the label-constant side is a bounded broadcast cross;
    // the adjustment side broadcasts too (≤ docs×labels observed rows) —
    // a shuffled join would force BOTH sides onto hash(doc_id, lbl)
    val scored = nWords.crossJoin(broadcast(consts.select(col("lbl"), col("lp0"), col("prior"))))
      .join(broadcast(adjSum.select(col("doc_id"), col("lbl"), col("s_adj"))),
        Seq("doc_id", "lbl"), "left")
      .select(
        col("doc_id"), col("lbl"),
        (col("n_words") * col("lp0") + coalesce(col("s_adj"), lit(0L)) + col("prior"))
          .as("score"))
    val best = scored
      .groupBy("doc_id")
      .agg(min(struct((-col("score")).as("neg"), col("lbl").as("lbl"))).as("b"))
      .select(col("doc_id"), col("b.lbl").as("pred"))
    broadcast(base.select(col("doc_id"), col("actual")))
      .join(best, "doc_id")
      .groupBy(col("actual").as("actual_label"), col("pred").as("pred_label"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("actual_label", "pred_label")
  }
}
