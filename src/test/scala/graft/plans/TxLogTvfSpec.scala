package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.{TxLog, Zones}

/** The lakehouse SQL surface: snapshot, time travel, CDF, and history
  * as table-valued functions — plain SQL over a txlog table with no
  * DataFrame API in sight.
  */
class TxLogTvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  test("graft_txlog / _changes / _history answer plain SQL, time travel included") {
    GraftExtensions.register(spark)
    val root = Zones.tempDir("txlog_tvf")
    TxLog.append(spark, root, batch(0, 10))   // v1
    TxLog.append(spark, root, batch(10, 25))  // v2
    TxLog.overwrite(spark, root, batch(50, 53)) // v3

    assert(spark.sql(s"SELECT count(*) AS n FROM graft_txlog('$root')")
      .head().getLong(0) === 3L)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_txlog('$root', 2)")
      .head().getLong(0) === 25L)
    // predicates compose: the TVF result is an ordinary relation
    assert(spark.sql(
      s"SELECT sum(id) FROM graft_txlog('$root', 2) WHERE id >= 10")
      .head().getLong(0) === (10L until 25L).sum)
    // CDF with the version tag
    val cdf = spark.sql(
      s"""SELECT _commit_version, count(*) AS n
         |FROM graft_txlog_changes('$root', 1, 2)
         |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(cdf.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((2L, 15L)))
    // history audit
    val h = spark.sql(s"SELECT action FROM graft_txlog_history('$root') ORDER BY version")
      .collect().map(_.getString(0)).toSeq
    assert(h === Seq("append", "append", "overwrite"))
    // literal-argument contract is enforced, not silently wrong
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_txlog('$root', 1, 2, 3)").collect()
    }
  }

  test("TIMESTAMP AS OF, typed CDF, and DESCRIBE DETAIL answer plain SQL") {
    GraftExtensions.register(spark)
    val root = Zones.tempDir("txlog_tvf2")
    TxLog.append(spark, root, batch(0, 10))  // v1
    TxLog.append(spark, root, batch(10, 25)) // v2
    import spark.implicits._
    TxLog.merge(spark, root,
      Seq((5L, "U-5"), (100L, "NEW-100")).toDF("id", "payload"), "id") // v3

    // TIMESTAMP AS OF: a timestamp literal between v1 and v2 resolves v1
    val ts = TxLog.history(spark, root).orderBy("version").collect()
      .map(_.getAs[Long]("commit_ts"))
    assume(ts(0) < ts(1), "commits landed in one millisecond; boundary ambiguous")
    val t1 = java.time.Instant.ofEpochMilli(ts(0)).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graft_txlog('$root', TIMESTAMP '${t1.replace("T", " ").stripSuffix("Z")}Z')")
      .head().getLong(0) === 10L)
    // typed change feed through the merge, in SQL
    val typed = spark.sql(
      s"""SELECT _change_type, count(*) AS n
         |FROM graft_txlog_changes('$root', 2, 3, false, true)
         |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(typed === Seq("insert" -> 1L, "update_postimage" -> 1L,
      "update_preimage" -> 1L))
    // DESCRIBE DETAIL: head version + replay-derived numbers, zero jobs
    val d = spark.sql(s"SELECT * FROM graft_txlog_detail('$root')").head()
    assert(d.getAs[Long]("version") === 3L)
    assert(d.getAs[Long]("n_files") >= 1L)
    assert(d.getAs[Long]("total_bytes") > 0L)
    assert(d.getAs[Long]("n_columns") === 2L)
    assert(d.getAs[String]("partition_by") === "")
  }
}
