package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * All harness queries are parameterized by the scale-factor directory and
  * read parquet directly — schema comes from the files (parquet is
  * self-describing), no inference cost. At cluster scale the same calls
  * work against `s3a://` / `hdfs://` prefixes unchanged.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** The events table's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    * — read as raw int64 nanos via the legacy conf and truncate), plain
    * TIMESTAMP(MICROS) without a timezone (read as TIMESTAMP_NTZ), or
    * micros with UTC. All three normalize to session-UTC TimestampType so
    * every downstream query and the DuckDB oracle (naive micros) agree.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // int64 nanos → FLOOR to micros: subtract the non-negative pmod
        // remainder first, THEN integer-divide (exact multiple, so `div`'s
        // toward-zero truncation equals floor). Bare `ts div 1000` disagrees
        // with DuckDB's date_trunc by 1µs on pre-epoch nanos; float division
        // would lose precision at 1e18-scale nanos (> 2^53).
        df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // UTC session ⇒ the cast keeps the same wall-clock micros DuckDB sees.
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
