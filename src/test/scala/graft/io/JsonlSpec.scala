package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The JSONL zone must round-trip exactly the payloads that break naive
  * line formats: embedded newlines (escaped as \n inside the JSON string,
  * so the FILE stays one-object-per-line and splittable), quotes,
  * backslashes, unicode, and nulls.
  */
class JsonlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("JSONL round-trips newlines, quotes, backslashes, unicode, and nulls") {
    val rows = Seq(
      (1L, "plain text", "en"),
      (2L, "line one\nline two\r\nline three", "en"),
      (3L, "she said \"hi\" and left", "fr"),
      (4L, "back\\slash and tab\there", "de"),
      (5L, "ünïcødé — 中文 🚀", "es"),
      (6L, null.asInstanceOf[String], "en")
    ).toDF("doc_id", "text", "lang")
    val tmp = Zones.tempDir("graft_jsonl_spec")
    Zones.writeJsonl(rows, tmp)
    val back = Zones.readJsonl(spark, rows.schema, Seq(tmp))
      .as[(Long, Option[String], String)].collect().toSet
    assert(back === rows.as[(Long, Option[String], String)].collect().toSet)
    // one-object-per-line: the files must have exactly as many lines as rows
    val files = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".json"))
    val nLines = files.map(f => scala.io.Source.fromFile(f, "UTF-8").getLines().size).sum
    assert(nLines === rows.count())
  }
}
