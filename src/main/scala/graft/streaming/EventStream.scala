package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming over the events schema (beyond-reference; the
  * reference is batch-only — SURVEY.md §2.8).
  *
  * `readStream` → watermarked tumbling-window aggregation → sink. The same
  * aggregation as `EventWindows.hourly`, so batch and stream results are
  * directly comparable (tested in `EventStreamSpec`). At scale this runs
  * per-microbatch with state cleanup driven by the watermark — late events
  * beyond 2 hours are dropped instead of accumulating state.
  */
object EventStream {

  /** Shared watermarked-read + hourly-aggregate body. The cents rule is
    * `EventWindows.cents` — ONE definition, so batch/stream comparability
    * (the whole point of `EventStreamSpec`) can't silently drift.
    */
  private def hourlyAgg(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      dedup: Boolean): DataFrame = {
    val in = spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark("ts", "2 hours")
    (if (dedup) in.dropDuplicatesWithinWatermark("event_id") else in)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(graft.operators.EventWindows.cents(col("value"))).as("value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("hour_bucket"),
        col("event_type"),
        col("n"),
        col("value_cents"))
  }

  def hourlyCounts(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    hourlyAgg(spark, inputDir, schema, dedup = false)

  /** Streaming deduplication: drop repeated `event_id`s within the
    * watermark horizon before aggregating — the streaming counterpart of
    * exact dedup (state for ids older than the watermark is evicted, so
    * memory stays bounded on an unbounded stream).
    */
  def dedupedHourlyCounts(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    hourlyAgg(spark, inputDir, schema, dedup = true)

  /** Stream-stream interval join: every error event matched to the same
    * user's purchases in the preceding `windowMinutes` — the streaming
    * counterpart of the batch range join (q42 semantics). Both sides carry
    * watermarks AND the join condition bounds `p_ts` relative to `e_ts`,
    * which is what lets Spark evict buffered purchase state once the
    * watermark passes `p_ts + window` — without the interval bound the
    * purchase buffer would grow forever on an unbounded stream.
    */
  def errorPurchaseJoin(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      windowMinutes: Int = 30): DataFrame = {
    def side(kind: String, prefix: String) =
      spark.readStream
        .schema(schema)
        .parquet(inputDir)
        .filter(col("event_type") === kind)
        .select(
          col("user_id").as(s"${prefix}_user"),
          col("ts").as(s"${prefix}_ts"),
          col("event_id").as(s"${prefix}_id"))
        .withWatermark(s"${prefix}_ts", "2 hours")
    side("error", "e").join(
      side("purchase", "p"),
      col("e_user") === col("p_user") &&
        col("p_ts") <= col("e_ts") &&
        col("p_ts") >= col("e_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("e_user").as("user_id"), col("e_id").as("err_id"), col("p_id"))
  }

  /** Run the streaming query to completion over the files currently in
    * `inputDir` (AvailableNow trigger) and return the materialized result.
    */
  def runAvailableNow(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      queryName: String = "hourly_events"): DataFrame =
    runToTable(hourlyCounts(spark, inputDir, schema), queryName)

  /** Incremental ingest: append-only transform of whatever files are NEW
    * under `inputDir` since the last run, exactly once, driven by the
    * checkpoint — run it repeatedly (cron, orchestrator) and each run picks
    * up only the delta. This is the lake's incremental-ETL primitive: at
    * 100 TB you never re-scan the corpus to ingest a day's arrivals, and
    * the checkpoint (file-source log + sink commit log) makes restarts
    * idempotent — a crashed run reprocesses nothing and loses nothing.
    */
  def incrementalIngest(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      checkpointDir: String,
      outDir: String)(transform: DataFrame => DataFrame): Unit = {
    val q = transform(spark.readStream.schema(schema).parquet(inputDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain any streaming DataFrame to a memory table (AvailableNow).
    * Aggregations use `complete`; stream-stream joins require `append`.
    */
  def runToTable(stream: DataFrame, queryName: String, outputMode: String = "complete"): DataFrame = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
