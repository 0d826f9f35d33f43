package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.9): image/audio/video as opaque
  * `binary` columns with typed metadata.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * [[decodeStub]] derives deterministic fake metadata from the bytes. The
  * Spark-side plumbing is real — schema, per-partition batch iteration,
  * frame sampling — so swapping in a real codec is a one-function change.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Deterministic fake decoder — a real implementation would parse the
    * container header here. Kept arithmetic-only so the DuckDB oracle can
    * replay it from byte length.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Int, Int, Int) = {
    val n = bytes.length.toLong
    (n, (n % 512).toInt, (n * 7 % 512).toInt, (n % 16).toInt)
  }

  /** Attach an opaque media column (here: the UTF-8 bytes of `textCol`;
    * in production: real image/audio payloads read via `binaryFile` source).
    */
  def withMediaColumn(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", col(textCol).cast("binary"))

  /** Decode / feature-extract over the binary column. Runs as a TYPED
    * `Dataset.mapPartitions` — stays on the unsafe-row path (the earlier
    * `df.rdd` formulation exited Tungsten and round-tripped every row
    * through `GenericRow`) while keeping the per-partition iterator hook a
    * real decoder needs to amortize codec init per batch (the Arrow/
    * pandas-UDF batch shape in Scala form).
    */
  def extractMeta(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null media (e.g. a null-text row cast to binary) would NPE the
    // decoder and kill the stage — undecodable rows are skipped
    df.select(col(idCol).cast("long"), col("media"))
      .filter(col("media").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec init" would go here
        it.map { case (id, bytes) =>
          val (n, w, h, f) = decodeStub(bytes)
          (id, n, w, h, f)
        }
      }
      .toDF(idCol, "n_bytes", "width", "height", "n_frames")
  }

  /** Resize step (stub): halve dimensions `factor` times, floor at 1 px —
    * a real implementation would re-encode pixels here; the metadata
    * arithmetic and column plumbing are the real part.
    */
  def resizeStub(meta: DataFrame, factor: Int): DataFrame =
    meta
      .withColumn("width", greatest(col("width").cast("int") / lit(1 << factor), lit(1)).cast("int"))
      .withColumn("height", greatest(col("height").cast("int") / lit(1 << factor), lit(1)).cast("int"))

  /** Frame sampling: pick every `stride`-th frame index from n_frames —
    * array arithmetic only, no decode.
    */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.withColumn(
      "sampled_frames",
      when(col("n_frames") > 0, sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))
}
