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
}
