package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.TestSpark

/** Pins the PERMISSIVE from_json null semantics the q103 oracle mirrors
  * with its DuckDB TRY_CAST chain: null input, malformed JSON, missing
  * key, and wrong-typed value must ALL extract as null (never error).
  */
class JsonExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("from_json PERMISSIVE: every malformed shape extracts null") {
    val kSchema = StructType.fromDDL("k BIGINT")
    val got = Seq(
      ("ok", """{"k": 69}"""),
      ("null", null: String),
      ("notjson", "not json"),
      ("missing", """{"j": 1}"""),
      ("wrongtype", """{"k": "x"}"""))
      .toDF("tag", "props")
      .select(col("tag"), from_json(col("props"), kSchema).getField("k").as("k"))
      .as[(String, Option[Long])].collect().toMap
    assert(got("ok") === Some(69L))
    assert(got("null").isEmpty && got("notjson").isEmpty
      && got("missing").isEmpty && got("wrongtype").isEmpty)
  }
}
