package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.TestSpark

class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = Seq(
    (1L, "mail me at jane.doe+spam@example.co.uk or call 555-867-5309 today"),
    (2L, "server 192.168.1.254 responded; backup at 10.0.0.1"),
    (3L, "ssn 123-45-6789 must never leak"),
    (4L, "clean text with no identifiers at all"),
    (5L, "double contact: a@b.io c@d.org and 111.222.333 not an ip")
  ).toDF("doc_id", "text")

  test("redact replaces each category with its placeholder") {
    val got = fixture.select(col("doc_id"), PiiScrub.redact(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "mail me at <EMAIL> or call <PHONE> today")
    assert(got(2L) === "server <IP> responded; backup at <IP>")
    assert(got(3L) === "ssn <SSN> must never leak")
    assert(got(4L) === "clean text with no identifiers at all")
    assert(got(5L) === "double contact: <EMAIL> <EMAIL> and 111.222.333 not an ip")
  }

  test("counts per category match, and nothing is double-counted") {
    val got = PiiScrub.withPiiColumns(fixture, "text")
      .select("doc_id", "n_email", "n_ssn", "n_ip", "n_phone", "n_pii")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) === ((1L, 0L, 0L, 1L, 2L)))
    assert(got(2L) === ((0L, 0L, 2L, 0L, 2L)))
    assert(got(3L) === ((0L, 1L, 0L, 0L, 1L)))
    assert(got(4L) === ((0L, 0L, 0L, 0L, 0L)))
    assert(got(5L) === ((2L, 0L, 0L, 0L, 2L)))
  }

  test("ssn-shaped spans are claimed by ssn, not phone") {
    // 3-2-4 digits is SSN; 3-3-4 is phone — the claim order must not let
    // the phone pattern eat a partial SSN span
    val df = Seq((1L, "ids: 123-45-6789 and 123-456-7890")).toDF("doc_id", "text")
    val r = PiiScrub.withPiiColumns(df, "text")
      .select("n_ssn", "n_phone").as[(Long, Long)].collect()(0)
    assert(r === ((1L, 1L)))
    val red = df.select(PiiScrub.redact(col("text"))).as[String].collect()(0)
    assert(red === "ids: <SSN> and <PHONE>")
  }
}
