package graft.operators

import org.apache.spark.sql.DataFrame
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
      k: Int = 10): DataFrame = {
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
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
