package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Bucketed tables co-locate join keys: the join below must plan with NO
  * shuffle exchange on either side (buckets align), proving the 100 TB
  * fact⋈fact path.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed LSH signature store joins an incremental batch without re-shuffling the store") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val sf = "/root/testdata/sf0.001"
    val corpus = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val old    = corpus.filter(col("doc_id") % 2 === 0)
    val fresh  = corpus.filter(col("doc_id") % 2 === 1)
    graft.operators.Dedup.writeSignatureStore(old, "doc_id", "text", "sig_store_b", numBuckets = 4)
    // save/restore the session's OWN values — hardcoding defaults in the
    // finally block would clobber any non-default conf other specs set on
    // the shared TestSpark session
    val savedBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAdaptive  = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ to expose bucketing
    spark.conf.set("spark.sql.adaptive.enabled", "false")        // concrete plan for traversal
    try {
      val inc = graft.operators.Dedup.incrementalCandidates(
        fresh, spark.table("sig_store_b"), "doc_id", "text")
      def bucketedScanIn(p: SparkPlan): Boolean =
        p.collectFirst {
          case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => s
        }.isDefined
      val storeJoin = inc.queryExecution.executedPlan.collectFirst {
        case j: SortMergeJoinExec if bucketedScanIn(j.left) || bucketedScanIn(j.right) => j
      }
      assert(storeJoin.isDefined, "store-vs-batch join did not use the bucketed scan")
      val storeSide = if (bucketedScanIn(storeJoin.get.left)) storeJoin.get.left else storeJoin.get.right
      assert(
        storeSide.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"store side was re-shuffled:\n$storeSide")
      // and the restructured two-join form still matches the full-corpus pairs
      val got = inc.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = graft.operators.Dedup.minhashCandidates(corpus, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => a % 2 == 1 || b % 2 == 1 }.toSet
      assert(got === full)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAdaptive)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark.sql("DROP TABLE IF EXISTS sig_store_b")
    }
  }

  test("join of two tables bucketed on the key plans without a shuffle") {
    val sf = "/root/testdata/sf0.001"
    Zones.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_custkey", 4)
    Zones.writeBucketed(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 4)
    val savedBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ to expose bucketing
    val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    try {
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() === Tables.orders(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
