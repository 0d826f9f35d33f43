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
  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects. Read the raw int64 nanos (legacy conf) and
    * truncate to microsecond TimestampType — the same truncation DuckDB's
    * `date_trunc('microseconds', ts)` applies, so oracle comparisons agree.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FLOOR semantics: subtract the non-negative pmod remainder first, THEN
    // integer-divide (exact multiple, so `div`'s toward-zero truncation
    // equals floor). Bare `ts div 1000` disagrees with DuckDB's date_trunc
    // by 1µs on pre-epoch nanos; float division would lose precision at
    // 1e18-scale nanos (> 2^53).
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
