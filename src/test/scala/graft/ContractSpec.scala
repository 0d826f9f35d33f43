package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself — cheap analysis-time checks that
  * catch drift before the (slower) oracle round-trip does.
  */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Every query has a DuckDB oracle (since r2 — q18 emits a canonical
    * token string, q38 asserts its sketch against the oracle's exact count).
    */
  private val rowsOnly = Set.empty[String]

  test("every query analyzes against the test tables with unique column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sfDir).schema // analysis only, no execution
      val dupes  = schema.fieldNames.groupBy(identity).collect { case (c, a) if a.length > 1 => c }
      assert(dupes.isEmpty, s"$name has duplicate columns: $dupes (driver sorts by name)")
      assert(schema.nonEmpty, name)
    }
  }

  test("oracle SQL covers exactly the non-rows-only queries") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet -- rowsOnly)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q54 exact-sum correlation agrees with Spark's float corr aggregate") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q54_corr_exact")(spark, sfDir)
      .select("l_returnflag", "corr_qty_price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity") * 100, col("l_extendedprice") * 100).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-6, s"flag $k: $v vs ${ref(k)}") }
  }

  test("q72 quantized unigram log-prob agrees with the float-avg formulation") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q72_unigram_logprob")(spark, sfDir)
      .select("doc_id", "mean_logprob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val words = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
    val wc  = words.groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = wc.agg(sum("cnt").as("total"))
    val ref = words.join(wc, "w").crossJoin(broadcast(tot))
      .withColumn("lp", log(col("cnt").cast("double") / col("total")))
      .groupBy("doc_id").agg(avg("lp").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-5, s"doc $k: $v vs ${ref(k)}") }
  }

  test("q38 HLL sketch stays within its 5% bound of the exact count") {
    val rows = SparkEntry.queries("q38_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")))
  }
}
