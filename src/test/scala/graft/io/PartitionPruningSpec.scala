package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Partition-pruned reads: a filter on the partition column must show up as
  * a PartitionFilter (pruned at file-listing time), not a data Filter over
  * a full scan.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("filter on partition column prunes at planning time") {
    val tmp = Files.createTempDirectory("graft_part").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    Zones.writePartitioned(events, tmp, "event_type")

    val q = spark.read.parquet(tmp).filter($"event_type" === "click")
    val planStr = q.queryExecution.executedPlan.toString

    assert(planStr.contains("PartitionFilters: [isnotnull(event_type"), planStr.take(800))
    val expected = events.filter($"event_type" === "click").count()
    assert(expected > 0)
    assert(q.count() === expected)
  }
}
