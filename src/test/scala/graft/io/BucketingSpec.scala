package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Bucketed tables co-locate join keys: the join below must plan with NO
  * shuffle exchange on either side (buckets align), proving the 100 TB
  * fact⋈fact path.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key plans without a shuffle") {
    val sf = "/root/testdata/sf0.001"
    Zones.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_custkey", 4)
    Zones.writeBucketed(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ to expose bucketing
    val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    try {
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() === Tables.orders(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
