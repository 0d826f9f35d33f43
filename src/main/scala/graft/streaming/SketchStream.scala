package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.types.StructType

import graft.operators.CorpusStats

/** Streaming count-min sketch maintenance: the heavy-hitter prefilter's
  * cell counts ([[CorpusStats.sketchCellRows]]) as a streaming
  * aggregation. The reason this is streamable AT ALL is the sketch's
  * defining property — the aggregation STATE is capped at depth·width
  * rows no matter how much text flows through, so complete-mode output
  * and in-memory state both stay bounded forever. A batch recount of
  * sketch survivors (the exact pass of [[CorpusStats.heavyHitters]])
  * can then run on demand against whatever the corpus has accumulated;
  * the sketch is the always-on, cheap part.
  *
  * Counts are additive per micro-batch (sum of counts = count of union),
  * so any arrival chunking yields exactly the batch sketch — spec-proven
  * in `SketchStreamSpec`.
  */
object SketchStream {

  /** The streaming cell-count aggregation over a docs stream. */
  def cellCounts(
      streamDocs: DataFrame,
      textCol: String,
      depth: Int = 2,
      width: Int = 16384): DataFrame =
    CorpusStats.sketchCellRows(streamDocs, textCol, depth, width)
      .groupBy("d", "cell")
      .agg(count(lit(1)).as("cnt"))

  /** Drain `inputDir` (AvailableNow) through the sketch aggregation into
    * an in-memory table; returns the final (d, cell, cnt) snapshot.
    * Complete mode is safe here precisely because the result is bounded
    * by depth·width.
    */
  def runAvailableNow(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      textCol: String,
      tableName: String,
      depth: Int = 2,
      width: Int = 16384): DataFrame = {
    val q = cellCounts(
      spark.readStream.schema(schema).parquet(inputDir), textCol, depth, width)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(tableName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(tableName).select(col("d"), col("cell"), col("cnt"))
  }
}
