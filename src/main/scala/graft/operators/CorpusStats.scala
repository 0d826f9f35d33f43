package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level lexical statistics for LLM-data curation (SURVEY.md §2.9):
  * vocabulary-growth (Heaps'-law) profiling and bigram-LM document scoring.
  * Both follow the q43/q72 scale discipline — per-(doc, term) counts are
  * the base relation, corpus totals DERIVE from it, log-probs are
  * quantized to exact integers so sums are aggregation-order-invariant.
  */
object CorpusStats {

  /** Vocabulary growth (Heaps' law): new distinct words per doc-id bucket
    * plus the cumulative vocabulary size — the diminishing-returns curve a
    * data-mixing team reads before buying more of a source.
    *
    * Scale shape: one word explode → `groupBy(word).min(doc_id)` (Zipf hot
    * keys like "the" are plain agg keys — partial aggregation collapses
    * them map-side) → per-bucket agg. The trailing cumulative window is
    * single-partition BUT runs on the bucket relation (corpus-size /
    * `bucketWidth` rows, bounded by construction), never on words or docs.
    * Bucket arithmetic is integer `div` — exact in both engines at any id
    * magnitude (double division would lose precision past 2^53).
    */
  def vocabGrowth(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bucketWidth: Long = 100L): DataFrame = {
    val words = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
    val cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    words
      .groupBy("w")
      .agg(min(col("doc_id")).as("first_doc"))
      .groupBy(expr(s"first_doc div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_new_words"))
      .withColumn("vocab_size", sum(col("n_new_words")).over(cum))
      .orderBy("bucket")
  }

  /** Corpus-bigram-LM document scoring: mean log P(w_i | w_{i-1}) per doc,
    * with the LM's bigram and context counts taken from the corpus itself —
    * the conditional-probability upgrade of the q72 unigram filter (a doc
    * of common words in impossible ORDER now scores low).
    *
    * Scale shape: bigrams hash to 48-bit keys at the explode (8-byte
    * shuffle rows, q71 discipline; the context word hashes separately
    * BEFORE the bigram string is discarded). Bigram TOKEN rows are the
    * base relation — no per-(doc, bigram) pre-aggregation layer: on real
    * text that key is nearly unique (measured ×1.04 compression at sf0.1),
    * so the layer costs a full extra shuffle+agg and collapses nothing.
    * The counting branch `groupBy(sk, wk)` shuffles PARTIALLY-AGGREGATED
    * rows (Zipf-hot bigrams collapse map-side); the scoring branch
    * shuffles raw 16-byte token rows into the ⋈log-prob join, deliberately
    * left to ENSURE_REQUIREMENTS so AQE can skew-split the hot-bigram key
    * (a pre-`repartition` would pin the hot key to one partition AND lose
    * the map-side collapse — the q60 lesson). Per-bigram log-probs are
    * quantized to exact 1e-6 integers (q61/q72 pattern) so per-doc sums
    * are partition-order-invariant and hash-match DuckDB (`ln` ≡ Spark
    * `log`, bit-for-bit on identical doubles). Docs with fewer than two
    * words have no bigram and are absent, mirrored by the oracle.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = Dedup
      .shingleRows(
        docs.filter(size(split(col(textCol), " ", -1)) >= 2),
        idCol, textCol, 2)
      .select(
        col("doc_id"),
        Dedup.md5Long(col("s"), 12).as("sk"),
        Dedup.md5Long(substring_index(col("s"), " ", 1), 12).as("wk"))
    val bc = bg.groupBy("sk", "wk").agg(count(lit(1)).as("cb"))
    val ctx = bc.groupBy("wk").agg(sum(col("cb")).as("cw"))
    val lp = bc
      .join(ctx, "wk")
      .withColumn(
        "lp",
        round(log(col("cb").cast("double") / col("cw").cast("double")) * 1000000, 0).cast("long"))
      .select(col("sk"), col("wk"), col("lp"))
    bg
      .join(lp, Seq("sk", "wk"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("_slp"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        round(col("_slp").cast("double") / col("n_bigrams") / 1000000.0, 6).as("mean_logprob"))
      .orderBy("doc_id")
  }
}
