package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.TestSpark

class RollingHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the closed-form fold (codegen path via DataFrame)") {
    val got = Seq("ab", "", "hello world").toDF("t")
      .select(RollingHash(col("t"))).as[Long].collect().toSeq
    def ref(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    assert(got === Seq(ref("ab"), 0L, ref("hello world")))
    assert(got.head === (97L * 31 + 98) % 1000000007L)
  }

  test("interpreted eval equals codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = RollingHash(Literal(UTF8String.fromString("spark"), org.apache.spark.sql.types.StringType))
    assert(e.eval(null) === RollingHash.hash("spark", RollingHash.DefaultModulus))
  }

  test("SQL registration via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_rolling_hash('ab') AS h").as[Long].collect()(0)
    assert(got === (97L * 31 + 98) % 1000000007L)
  }

  test("null input yields null") {
    val got = Seq(Option.empty[String]).toDF("t")
      .select(RollingHash(col("t"))).collect()(0)
    assert(got.isNullAt(0))
  }
}
