package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain join result") {
    val sf = "/root/testdata/sf0.001"
    val big   = Tables.lineitem(spark, sf).withColumnRenamed("l_partkey", "partkey")
    val small = Tables.part(spark, sf).withColumnRenamed("p_partkey", "partkey")

    val plain  = big.join(small, Seq("partkey"))
    val salted = SkewJoin.saltedJoin(big, small, "partkey", saltFactor = 8,
      bigDistinctCol = "l_orderkey")

    assert(salted.count() === plain.count())
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("p_brand").count().as[(String, Long)].collect().toMap
    assert(agg(salted) === agg(plain))
  }
}
