package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-plan audit of the TxLogFileIndex read path: the scan must be
  * a stock parquet FileSourceScan with the predicate PUSHED (row-group
  * skipping inside surviving files) AND whole-stage codegen'd — file
  * pruning must not cost the downstream plan anything.
  */
class TxLogPlanAudit extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("snapshot().filter plans as a pushed-down, codegen'd parquet scan") {
    import spark.implicits._
    val root = Zones.tempDir("txlog_plan")
    TxLog.commit(spark, root,
      (0 until 1000).map(i => (i.toLong, s"p-$i")).toDF("id", "payload")
        .repartitionByRange(4, col("id")),
      TxLog.Append, statsCols = Seq("id"))
    val q = TxLog.snapshot(spark, root).filter(col("id").between(100, 120))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"expected a parquet FileScan:\n$plan")
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(id,100\\).*"),
      s"range predicate must reach the parquet reader:\n$plan")
    // executedPlan.toString renders whole-stage codegen stages as "*(n)"
    assert(plan.contains("*(1) Filter") || plan.contains("*(1) ColumnarToRow"),
      s"the txlog scan must stay inside whole-stage codegen:\n$plan")
    assert(plan.contains("Batched: true"),
      s"the txlog scan must use the vectorized parquet reader:\n$plan")
    assert(q.count() === 21L)
  }

  test("a DV-bearing snapshot plans the subtraction as a broadcast hash anti-join") {
    import spark.implicits._
    val root = Zones.tempDir("txlog_plan_dv")
    TxLog.commit(spark, root,
      (0 until 1000).map(i => (i.toLong, s"p-$i")).toDF("id", "payload")
        .repartitionByRange(4, col("id")),
      TxLog.Append, statsCols = Seq("id"))
    TxLog.deleteVectors(spark, root, col("id") % 10 === 0)
    val q = TxLog.snapshot(spark, root).filter(col("id").between(100, 120))
    val plan = q.queryExecution.executedPlan.toString
    // the position subtraction: hash anti-join on the equi key (row
    // index), deletion side broadcast — NEVER a nested-loop/cartesian
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"DV subtraction must be a broadcast hash anti-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"DV subtraction must not degrade to a nested loop:\n$plan")
    // the data predicate still reaches the parquet reader THROUGH the join
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(id,100\\).*"),
      s"predicates must push through the DV anti-join into the scan:\n$plan")
    assert(plan.contains("Batched: true"),
      s"the DV read must keep the vectorized parquet reader:\n$plan")
    assert(q.count() === 18L) // 21 minus the deleted 100, 110, 120
  }
}
