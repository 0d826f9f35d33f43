package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index layout planning — the size/encoding readouts an indexing
  * team runs BEFORE building a 100 TB postings store (next to q209's BM25,
  * which consumes such an index).
  *
  * Postings are split into 2^16-document chunks (the roaring-bitmap
  * container grid): every per-term computation — delta gaps, run counts,
  * container choice — is keyed by `(term, chunk)`, so no window partition
  * ever exceeds 65,536 rows NO MATTER how common the term is. The naive
  * `PARTITION BY term` postings sort is exactly the skew shape q60's fix
  * removed (the #1 term in a web corpus appears in ~every doc); chunking is
  * how production bitmap indexes sidestep it, and it parallelizes the build
  * by `df_t / 2^16` instead of serializing on hot terms.
  */
object Indexing {

  /** Distinct (term, doc) postings with chunk-local delta gaps.
    *
    * `gap = local − prev_local` within the `(w, chunk)` window (the first
    * posting of a chunk takes `local + 1`, i.e. the delta from the chunk
    * base − 1) — always ≥ 1, ≤ 2^16, so varint widths are decidable by
    * pure threshold CASEs mirrored verbatim in the oracle.
    */
  def postingsChunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val p = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .withColumn("chunk", expr("doc_id div 65536"))
      .withColumn("local", expr("doc_id % 65536"))
    val win = Window.partitionBy("w", "chunk").orderBy("local")
    p.withColumn("prev", lag(col("local"), 1).over(win))
      .withColumn("gap", col("local") - coalesce(col("prev"), lit(-1L)))
      .withColumn("run_start",
        when(col("prev").isNull || col("local") - col("prev") =!= 1, 1L).otherwise(0L))
      .select(col("w"), col("chunk"), col("local"), col("gap"), col("run_start"))
  }

  /** Varint (LEB128) byte width of a delta gap — 7 payload bits per byte. */
  def vbyteBytes(gapCol: String): org.apache.spark.sql.Column =
    expr(s"CASE WHEN $gapCol < 128 THEN 1 WHEN $gapCol < 16384 THEN 2" +
      s" WHEN $gapCol < 2097152 THEN 3 WHEN $gapCol < 268435456 THEN 4 ELSE 5 END")

  /** Per-chunk container choice census (roaring-bitmap cost model: array =
    * 2 bytes/posting, bitmap = fixed 8192, run = 2 + 4/run), with the
    * deterministic cost tie-break array < run < bitmap.
    */
  def containerCensus(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chunks = postingsChunks(docs, idCol, textCol)
      .groupBy("w", "chunk")
      .agg(count(lit(1)).as("n"), sum(col("run_start")).as("n_runs"))
      .withColumn("array_bytes", col("n") * 2)
      .withColumn("run_bytes", col("n_runs") * 4 + 2)
      .withColumn("bitmap_bytes", lit(8192L))
      .withColumn("container",
        when(col("array_bytes") <= col("run_bytes") &&
          col("array_bytes") <= col("bitmap_bytes"), "array")
          .when(col("run_bytes") <= col("bitmap_bytes"), "run")
          .otherwise("bitmap"))
      .withColumn("bytes",
        least(col("array_bytes"), col("run_bytes"), col("bitmap_bytes")))
    chunks
      .groupBy("container")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n")).as("n_postings"),
        sum(col("bytes")).as("total_bytes"),
        sum(col("array_bytes")).as("array_cost_bytes"))
      .withColumn("saving_ppm",
        expr("(array_cost_bytes - total_bytes) * 1000000 div array_cost_bytes"))
      .orderBy("container")
  }
}
