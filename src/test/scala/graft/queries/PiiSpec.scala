package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the PII patterns + redaction contract on realistic text (the
  * sf corpus carries no PII — tx_pii's query demonstrates the shape on
  * a synthesized suffix; the semantics live here).
  */
class PiiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextQueries.redact(col("t"))).head.getString(0)
  }

  private def counts(s: String): (Long, Long, Long) = {
    import spark.implicits._
    val r = Seq(s).toDF("t").select(
      regexp_count(col("t"), lit(TextQueries.PiiEmail)),
      regexp_count(col("t"), lit(TextQueries.PiiPhone)),
      regexp_count(col("t"), lit(TextQueries.PiiIp))).head
    (r.getInt(0).toLong, r.getInt(1).toLong, r.getInt(2).toLong)
  }

  test("email, phone, and IPv4 each detected and redacted") {
    val s = "reach me at jane.doe+spam@mail.example.org or 555-0199 " +
      "from host 192.168.1.23 thanks"
    assert(counts(s) === ((1L, 1L, 1L)))
    assert(redactOne(s) ===
      "reach me at <EMAIL> or <PHONE> from host <IP> thanks")
  }

  test("multiple hits of one kind all redact") {
    val s = "a@b.io c@d.net"
    assert(counts(s) === ((2L, 0L, 0L)))
    assert(redactOne(s) === "<EMAIL> <EMAIL>")
  }

  test("clean text passes through untouched with zero counts") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(counts(s) === ((0L, 0L, 0L)))
    assert(redactOne(s) === s)
  }

  test("plain words with dots or digits are not false positives") {
    // version strings only match the IP pattern when 4 dotted octets
    // actually appear; short digit runs don't match the phone shape
    val s = "release v1.2 built 2024 costs 12-34 dollars"
    assert(counts(s) === ((0L, 0L, 0L)))
    assert(redactOne(s) === s)
  }

  test("redaction order: the email tag survives later passes") {
    // an address whose local part contains a phone-shaped run — the
    // email pass consumes it first, so no <PHONE> appears inside
    val s = "mail 555-0100@ops.example.com now"
    assert(redactOne(s) === "mail <EMAIL> now")
  }
}
