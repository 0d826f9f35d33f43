package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.{TxLog, TxLogFileIndex, Zones}

/** `format("graft")` as a user would drive it: reads (head, versionAsOf,
  * timestampAsOf) plan through [[TxLogFileIndex]] with pruning intact,
  * merge-on-read snapshots keep full semantics through the wrapper
  * relation, writes honor SaveModes + partitionBy, the session catalog
  * holds `USING graft` tables, and the V2 path equals the TVF twin.
  */
class GraftDataSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batch(lo: Int, hi: Int, tag: String = "v") = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"$tag-$i")).toDF("id", "payload")
  }

  test("a plain snapshot reads BARE: the user's plan holds the TxLogFileIndex, pruning fires") {
    val root = Zones.tempDir("dsplain")
    (0 until 3).foreach(f => TxLog.commit(spark, root,
      batch(1000 * f, 1000 * f + 1000).coalesce(1), TxLog.Append,
      statsCols = Seq("id")))
    val df = spark.read.format("graft").load(root)
    assert(df.count() === 3000L)
    // the relation in the USER'S plan is the index-backed file source —
    // pushdown and zone-map pruning are visible, not hidden in a wrapper
    val q = df.filter(col("id").between(1100L, 1200L))
    assert(q.count() === 101L)
    assert(TxLogFileIndex.of(q).lastListed.size === 1,
      "zone maps must prune through format(\"graft\")")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(id,1100)"),
      s"parquet pushdown must survive the provider:\n$plan")
  }

  test("versionAsOf / timestampAsOf time-travel through the reader options") {
    val root = Zones.tempDir("dstravel")
    TxLog.append(spark, root, batch(0, 100))
    val tAfterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    TxLog.append(spark, root, batch(100, 250))
    assert(spark.read.format("graft").load(root).count() === 250L)
    assert(spark.read.format("graft").option("versionAsOf", "1")
      .load(root).count() === 100L)
    assert(spark.read.format("graft")
      .option("timestampAsOf", tAfterV1.toString).load(root).count() === 100L)
    intercept[IllegalArgumentException](spark.read.format("graft")
      .option("versionAsOf", "1").option("timestampAsOf", "0").load(root))
  }

  test("merge-on-read state (DVs, column mapping) keeps FULL semantics via the wrapper") {
    val root = Zones.tempDir("dsmor")
    (0 until 2).foreach(f => TxLog.commit(spark, root,
      batch(1000 * f, 1000 * f + 1000).coalesce(1), TxLog.Append,
      statsCols = Seq("id")))
    TxLog.deleteVectors(spark, root, col("id") % 10 === 3L) // 200 gone
    TxLog.renameColumn(root, "payload", "text")
    val df = spark.read.format("graft").load(root)
    assert(df.columns.toSeq === Seq("id", "text"),
      "the column mapping must surface LOGICAL names")
    assert(df.count() === 1800L, "deleted positions must not resurface")
    assert(df.filter(col("id") === 3L).count() === 0L)
    assert(df.filter(col("text") === "v-7").count() === 1L)
    // predicate + projection still push into the wrapper
    val q = df.filter(col("id") > 1500L).select("text")
    assert(q.count() === 449L) // 499 ids above 1500, minus the 50 deleted
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1500)"),
      s"the wrapper must report its pushed filters:\n$plan")
    // parity with the internal snapshot, row for row
    val a = df.orderBy("id", "text").collect().toSeq
    val b = TxLog.snapshot(spark, root).orderBy("id", "text").collect().toSeq
    assert(a === b)
  }

  test("the V2 read equals its TVF twin, hash for hash") {
    val root = Zones.tempDir("dstvf")
    TxLog.commit(spark, root, batch(0, 500).coalesce(1), TxLog.Append,
      statsCols = Seq("id"))
    TxLog.deleteVectors(spark, root, col("id") >= 450L)
    graft.plans.GraftExtensions.register(spark)
    val viaTvf = spark.sql(s"SELECT * FROM graft_txlog('$root')")
      .orderBy("id").collect().toSeq
    val viaV2 = spark.read.format("graft").load(root)
      .orderBy("id").collect().toSeq
    assert(viaV2 === viaTvf)
  }

  test("writes: append / overwrite / errorIfExists / ignore / partitionBy") {
    val root = Zones.tempDir("dswrite")
    batch(0, 100).write.format("graft").mode("append").save(root)
    batch(100, 150).write.format("graft").mode("append").save(root)
    assert(spark.read.format("graft").load(root).count() === 150L)
    intercept[IllegalStateException](
      batch(0, 1).write.format("graft").mode("errorifexists").save(root))
    batch(0, 1).write.format("graft").mode("ignore").save(root) // no-op
    assert(spark.read.format("graft").load(root).count() === 150L)
    batch(500, 520).write.format("graft").mode("overwrite").save(root)
    assert(spark.read.format("graft").load(root).count() === 20L)
    assert(TxLog.snapshot(spark, root).count() === 20L,
      "the write path must be the same transaction log the API sees")
    // hive-layout partitioned write via the standard writer surface
    val proot = Zones.tempDir("dswritep")
    import spark.implicits._
    (0 until 90).map(i => (i.toLong, s"g${i % 3}", s"p-$i"))
      .toDF("id", "grp", "payload")
      .write.format("graft").partitionBy("grp").mode("append").save(proot)
    val pdf = spark.read.format("graft").load(proot)
    assert(pdf.count() === 90L)
    val pq = pdf.filter(col("grp") === "g1")
    assert(pq.count() === 30L)
    assert(TxLogFileIndex.of(pq).lastListed
      .forall(_.contains("grp=g1")), "partition pruning must fire")
  }

  test("the session catalog holds USING graft tables") {
    val root = Zones.tempDir("dscat")
    TxLog.commit(spark, root, batch(0, 300).coalesce(1), TxLog.Append,
      statsCols = Seq("id"))
    val tbl = s"graft_cat_${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$root'")
    try {
      assert(spark.table(tbl).count() === 300L)
      assert(spark.sql(s"SELECT count(*) AS n FROM $tbl WHERE id < 100")
        .head().getLong(0) === 100L)
      // catalog reads still plan through the index
      val q = spark.table(tbl).filter(col("id") < 100L)
      q.count()
      assert(q.queryExecution.executedPlan.toString.contains("PushedFilters"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SQL DML: DELETE / UPDATE / MERGE drive the txlog's row-level APIs") {
    val root = Zones.tempDir("dsdml")
    TxLog.commit(spark, root, batch(0, 100).coalesce(1), TxLog.Append,
      statsCols = Seq("id"))
    val s2 = GraftSession.withDml(spark)
    val tbl = s"graft_dml_${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    s2.sql(s"CREATE TABLE $tbl USING graft LOCATION '$root'")
    try {
      // DELETE: merge-on-read vectors, no rewrite
      val vDel = s2.sql(s"DELETE FROM $tbl WHERE id >= 90").head().getLong(0)
      assert(vDel === TxLog.headVersion(root))
      assert(TxLog.snapshot(spark, root).count() === 90L)
      // UPDATE: SET may reference other columns
      s2.sql(s"UPDATE $tbl SET payload = concat(payload, '!') WHERE id < 10")
      val snap = TxLog.snapshot(spark, root)
      assert(snap.filter(col("payload") === "v-5!").count() === 1L)
      assert(snap.filter(col("payload") === "v-50").count() === 1L)
      // MERGE: upsert through the file-granular API (the source temp
      // view is session-scoped — it must live in the DML session)
      locally {
        import s2.implicits._
        Seq((5L, "merged"), (200L, "inserted")).toDF("id", "payload")
          .createOrReplaceTempView("dml_src")
      }
      s2.sql(
        s"""MERGE INTO $tbl USING dml_src ON $tbl.id = dml_src.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val after = TxLog.snapshot(spark, root)
      assert(after.count() === 91L)
      assert(after.filter(col("id") === 5L).select("payload")
        .head().getString(0) === "merged")
      assert(after.filter(col("id") === 200L).count() === 1L)
    } finally s2.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
