package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping fixed-width character chunking — the context-window /
  * RAG-passage preparation step (reference scope: the tokenize-to-fixed-
  * width stage generalized to sliding windows; cf. SURVEY.md §2.9 text
  * ops).
  *
  * Coverage contract: chunk starts are `1, 1+stride, …` up to
  * `max(len − width + stride, 1)`, so every character lands in at least
  * one chunk, the final chunk is the only one allowed to run short
  * (`substr` past the end clamps to the prefix in both Spark and DuckDB),
  * and a text shorter than `width` yields exactly one whole-text chunk.
  *
  * Scale shape: one `posexplode` over a per-row integer sequence — pure
  * map, no shuffle, stays in whole-stage codegen; output size is
  * `len/stride` rows per doc with `chunk_id` derivable from the offset
  * (`(off−1)/stride`), so no window function is needed for numbering.
  */
object Chunking {

  def charChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      width: Int = 128,
      stride: Int = 96): DataFrame = {
    require(stride > 0 && width >= stride, "need 0 < stride <= width (gapless coverage)")
    val t = col(textCol)
    docs
      .filter(t.isNotNull)
      .select(
        col(idCol).as("doc_id"),
        posexplode(sequence(
          lit(1),
          greatest(length(t) - lit(width - stride), lit(1)),
          lit(stride))).as(Seq("chunk_id", "off")),
        t.substr(col("off"), lit(width)).as("chunk"))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        col("off").cast("long").as("off"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
  }
}
