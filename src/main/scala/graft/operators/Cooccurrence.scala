package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word co-occurrence with pointwise mutual information (SURVEY.md §2.9
  * text-analysis family): PMI(a,b) = ln(c_ab · N / (c_a · c_b)) over
  * document-level containment counts.
  *
  * Scale shape: pairs are generated MAP-SIDE from each doc's capped
  * distinct-word array (first `maxWordsPerDoc` lexicographic words) — cost
  * Σ (words-per-doc)², bounded by `maxWordsPerDoc²` per document, never
  * |vocab|², and with no self-join: the only shuffles are one `collect_set`
  * per doc and the two count aggregations. Support threshold is the integer
  * comparison `c_ab · minSupportDenom >= N` (scale-invariant, no floating
  * cutoff).
  */
object Cooccurrence {

  def pmiPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSupportDenom: Int = 20,
      topK: Int = 50,
      maxWordsPerDoc: Int = 64): DataFrame = {
    // One shuffle builds the per-doc capped word array: collect_set
    // deduplicates within the aggregation (partial map-side merge), and the
    // cap is a deterministic first-N by lexicographic order via a bounded
    // per-doc array sort — a row_number window would SORT every (doc, word)
    // partition; this sorts only each doc's own (document-length-bounded)
    // set locally. Marginals (ca) are computed from the SAME capped arrays,
    // keeping pair and word counts consistent.
    val capped = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id")
      .agg(slice(array_sort(collect_set(col("w"))), 1, maxWordsPerDoc).as("_ws"))
    val ca = capped
      .select(explode(col("_ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // Pair generation is a pure map (two chained generates, whole-stage
    // codegen'd — no interpreted array lambdas): posexplode yields each
    // word with its 0-based position i, and the second explode emits the
    // (sorted-order-later) partners slice(_ws, i+2, …). Ordered arrays make
    // every pair (a < b) exactly once — the former dw⋈dw self-join produced
    // the same multiset by shuffling the word relation twice.
    val pairs = capped
      .select(posexplode(col("_ws")).as(Seq("_i", "w_a")), col("_ws"))
      .select(
        col("w_a"),
        explode(slice(col("_ws"), col("_i") + 2, lit(maxWordsPerDoc))).as("w_b"))
      .groupBy("w_a", "w_b")
      .agg(count(lit(1)).as("c_ab"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    pairs
      .join(ca.select(col("w").as("w_a"), col("c").as("c_a")), "w_a")
      .join(ca.select(col("w").as("w_b"), col("c").as("c_b")), "w_b")
      .crossJoin(broadcast(n))
      .filter(col("c_ab") * minSupportDenom >= col("n_docs"))
      .withColumn(
        "pmi",
        round(log((col("c_ab") * col("n_docs")).cast("double") / (col("c_a") * col("c_b"))), 6))
      .select(col("w_a"), col("w_b"), col("c_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("w_a"), col("w_b"))
      .limit(topK)
  }
}
