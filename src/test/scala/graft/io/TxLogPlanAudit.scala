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

  test("log statistics drive join planning: a mostly-deleted dim broadcasts by LIVE size") {
    import spark.implicits._
    val root = Zones.tempDir("txlog_plan_stats")
    // a dim whose FILE bytes are big but whose live fraction is tiny:
    // 20k fat rows, then a DV delete of 95% — bytes-only estimation sees
    // the full file, the log's row-count ledger sees 5%
    TxLog.commit(spark, root,
      (0 until 20000).map(i => (i.toLong, "x" * 64 + i)).toDF("k", "pay")
        .coalesce(1),
      TxLog.Append, statsCols = Seq("k"))
    TxLog.deleteVectors(spark, root, col("k") % 20 =!= 0L)
    val r = TxLog.replay(root, TxLog.headVersion(root))
    val rawBytes = r.entries.flatMap(_.bytes).sum
    val scaled = TxLogFileIndex.of(TxLog.snapshot(spark, root)).sizeInBytes
    assert(scaled < rawBytes / 10,
      s"the index's Catalyst size must reflect the live fraction: $scaled vs $rawBytes")
    val fact = spark.range(0, 100000).toDF("k")
    def innerJoinKind(threshold: Long): String = {
      val was = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
        val j = fact.join(TxLog.snapshot(spark, root), "k")
        val lines = j.queryExecution.executedPlan.toString.split("\n")
        if (lines.exists(l => l.contains("BroadcastHashJoin") && l.contains("Inner")))
          "broadcast"
        else "shuffle"
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", was)
    }
    // threshold BETWEEN live and raw: bytes-only estimation would refuse
    // the broadcast; the log-stats estimate takes it
    assert(innerJoinKind((scaled + rawBytes) / 2) === "broadcast",
      "the planner must broadcast the dim from log stats alone")
    // sanity: below the live size even log stats refuse
    assert(innerJoinKind(math.max(1L, scaled / 2)) === "shuffle",
      "an estimate below the threshold must not broadcast")
  }

  test("the row-count ledger reaches Catalyst: exact rowCount stats and a CBO join reorder bytes can't make") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def mk(tag: String, n: Int): String = {
      val root = Zones.tempDir(s"txlog_rc_$tag")
      TxLog.commit(spark, root,
        (0 until n).map(i => (i.toLong, s"$tag-$i")).toDF(s"k_$tag", s"p_$tag")
          .coalesce(1), TxLog.Append, statsCols = Seq(s"k_$tag"))
      root
    }
    val big = mk("big", 20000)
    val mid = mk("mid", 2000)
    val tiny = mk("tiny", 50)
    def relStats(root: String) = TxLog.snapshot(spark, root)
      .queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.stats
      }.get
    // the INNERMOST inner join of the optimized 3-table plan — whose
    // participants reveal the chosen join ORDER (attribute names carry
    // their table tag). The DV anti-join never matches (LeftAnti).
    def innermostInnerCols(): Set[String] = {
      val j = TxLog.snapshot(spark, big)
        .join(TxLog.snapshot(spark, mid), col("k_big") === col("k_mid"))
        .join(TxLog.snapshot(spark, tiny), col("k_mid") === col("k_tiny"))
      j.queryExecution.optimizedPlan.collect {
        case jn: Join if jn.joinType == org.apache.spark.sql.catalyst.plans.Inner &&
          jn.children.forall(_.collect {
            case inner: Join if inner.joinType == org.apache.spark.sql.catalyst.plans.Inner => inner
          }.isEmpty) => jn
      }.head.output.map(_.name).filter(_.startsWith("k_")).toSet
    }
    val confs = Seq("spark.sql.cbo.planStats.enabled",
      "spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    try {
      // WITHOUT the stats flags: the written (worst) order survives —
      // the big table is in the innermost join
      assert(innermostInnerCols().contains("k_big"),
        "bytes-only planning must keep the as-written join order")
      confs.foreach(spark.conf.set(_, "true"))
      // exact cardinality, straight from the manifest row ledger
      assert(relStats(big).rowCount === Some(BigInt(20000)))
      // ... and it tracks deletion vectors: LIVE rows, not file rows
      TxLog.deleteVectors(spark, big, col("k_big") % 2 === 0L)
      assert(relStats(big).rowCount === Some(BigInt(10000)),
        "rowCount must be live rows (ledger rows − dvRows)")
      // CBO join reorder — possible ONLY because every base relation
      // carries a rowCount (CostBasedJoinReorder skips otherwise): the
      // two small tables join first, the 20k-row table moves outermost
      val cols = innermostInnerCols()
      assert(cols.contains("k_mid") && cols.contains("k_tiny") &&
        !cols.contains("k_big"),
        s"row-based cost must join the small tables first, got $cols")
    } finally confs.foreach(spark.conf.unset)
  }
}
