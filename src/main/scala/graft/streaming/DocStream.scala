package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Streaming near-dup-on-arrival: the production loop that keeps a corpus
  * deduped WITHOUT ever re-signaturing it. Each micro-batch of documents is
  * signatured once, joined against the persisted LSH signature store
  * ([[Dedup.incrementalCandidates]] — candidate pairs involving a new doc),
  * and its signatures are appended to the store for the batches after it.
  *
  * Exactly-once: `foreachBatch` is at-least-once on retry, so both sinks
  * write into a `batch_id=<id>` subdirectory with Overwrite — a replayed
  * batch overwrites its own output instead of duplicating it, which
  * together with the checkpointed source log gives effective
  * exactly-once. The store is read back through partition discovery (the
  * `batch_id` partition column is dropped), so "the store" is just the
  * accumulated parquet prefix — at 100 TB this is the lake table you'd
  * periodically compact ([[graft.io.Zones.compact]]) and bucket
  * ([[Dedup.writeSignatureStore]]) to make the per-batch join
  * shuffle-free on the store side.
  */
object DocStream {

  private def storeOrEmpty(spark: SparkSession, storeDir: String): DataFrame = {
    val p  = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      spark.read.parquet(storeDir).select("doc_id", "b", "bsig")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType.fromDDL("doc_id BIGINT, b INT, bsig STRING"))
  }

  /** Process whatever files are new under `inputDir` (AvailableNow +
    * checkpoint): emit candidate pairs involving the new docs to
    * `pairsDir`, then extend the signature store. Run repeatedly; each run
    * picks up only the delta. After N runs over a corpus streamed in any
    * chunking, the union of emitted pairs equals the batch
    * [[Dedup.minhashCandidates]] of the whole corpus (spec-proven).
    */
  def dedupOnArrival(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      checkpointDir: String,
      storeDir: String,
      pairsDir: String): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val docs = batch.select(col("doc_id"), col("text"))
        docs.sparkSession.sparkContext.setJobDescription(s"dedup-on-arrival batch $batchId")
        // the store must predate this batch's own signatures: read first
        val store = storeOrEmpty(docs.sparkSession, storeDir)
        Dedup
          .incrementalCandidates(docs, store, "doc_id", "text")
          .write.mode(SaveMode.Overwrite).parquet(s"$pairsDir/batch_id=$batchId")
        Dedup
          .bandSignatures(docs, "doc_id", "text")
          .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The accumulated candidate pairs across all processed batches. */
  def emittedPairs(spark: SparkSession, pairsDir: String): DataFrame =
    spark.read.parquet(pairsDir).select("doc_a", "doc_b", "n_bands")
}
