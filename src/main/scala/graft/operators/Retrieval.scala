package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 document retrieval over whitespace tokens — the
  * keyword-search readout a curation team uses to pull "docs about X"
  * from a corpus without an embedding index.
  *
  * Scoring is the Lucene variant (always-positive idf):
  * `score(d) = Σ_t ln(1 + (N−df+0.5)/(df+0.5)) · tf·(k1+1) / (tf + k1·(1−b+b·len/avgdl))`
  * with k1 = 6/5, b = 3/4. With avgdl = L/N substituted, the
  * term ratio is the pure rational `44·tf·L / (20·tf·L + 6·L + 18·len·N)`
  * — so each term contribution is `idf_micro` (the single ln call,
  * micro-quantized, q72 discipline) times an exact integer ratio, rounded
  * half-away into an integer micro-score BEFORE the per-doc sum. Integer
  * sums commute: partition-count-invariant, cross-engine identical.
  *
  * Scale shape: the term filter lands in the scan projection (only query
  * terms survive the explode), so tf is a tiny hash agg; df derives from
  * tf; doc lengths are one count per doc; totals are a 1-row broadcast.
  * Products reach idf·tf·L ≈ 10²⁶ at 100 TB — decimal(38,0), not long.
  */
object Retrieval {

  private val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int = 10): DataFrame =
    bm25Scores(docs, idCol, textCol, terms)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** Unranked BM25 scores for every doc matching ≥ 1 query term — the
    * relation [[bm25TopK]] and the hybrid RRF fusion rank over.
    */
  def bm25Scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String]): DataFrame = {
    val words = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
    val lens = words.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val totals = lens.agg(sum(col("len")).as("big_l"), count(lit(1)).as("big_n"))
    val tf = words
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("w").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals)) // 1-row totals
      .select(
        col("w"),
        round(log(lit(1.0) +
          ((col("big_n") - col("df")).cast("double") + 0.5) /
            (col("df").cast("double") + 0.5)) * 1000000, 0).cast("long").as("idf_micro"))
    tf
      .join(broadcast(idf), "w") // ≤ |terms| rows
      .join(lens, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("_num",
        col("idf_micro").cast(dec38) * 44 * col("tf").cast(dec38) * col("big_l").cast(dec38))
      .withColumn("_den",
        lit(20) * col("tf").cast(dec38) * col("big_l").cast(dec38)
          + lit(6) * col("big_l").cast(dec38)
          + lit(18) * col("len").cast(dec38) * col("big_n").cast(dec38))
      .withColumn("_c", expr("(2 * _num + _den) div (2 * _den)"))
      .groupBy("doc_id")
      .agg(sum(col("_c")).as("_score"), count(lit(1)).as("n_terms"))
      .select(
        col("doc_id"), col("n_terms"),
        round(col("_score").cast("double") / 1000000.0, 6).as("bm25"))
  }

  /** Reciprocal-rank fusion of a sparse (BM25) and a dense (cosine)
    * ranking: `RRF(d) = Σ_r 1/(C + rank_r(d))` with the standard C = 60,
    * each reciprocal nano-quantized to an integer so the fused ordering
    * has no float boundary. Docs appearing in only one ranking contribute
    * that ranking's term alone (the union semantics of Cormack et al.,
    * SIGIR'09). Both input rankings arrive as (doc_id, rank) relations —
    * rank construction stays with the caller, fusion is pure.
    *
    * Scale shape: two bounded ranked relations full-outer-joined on
    * doc_id; the fused top-k is one ordered limit. Nothing here touches
    * the corpus.
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int = 10, c: Int = 60): DataFrame = {
    def contrib(r: Column): Column =
      coalesce(round(lit(1000000000.0) / (lit(c) + r), 0).cast("long"), lit(0L))
    sparse.select(col("doc_id"), col("rank").as("r_sparse"))
      .join(dense.select(col("doc_id"), col("rank").as("r_dense")), Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        coalesce(col("r_sparse"), lit(0L)).as("r_sparse"),
        coalesce(col("r_dense"), lit(0L)).as("r_dense"),
        (contrib(col("r_sparse")) + contrib(col("r_dense"))).as("rrf_u"))
      .orderBy(col("rrf_u").desc, col("doc_id"))
      .limit(k)
  }
}
