package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("custom expressions are callable from SQL via extensions") {
    // Extensions apply only at session construction, so this suite
    // replaces any shared session for its duration (tests run
    // sequentially; later suites recreate via getOrCreate).
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession.builder("4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT byte_sum_mod('1234', 8) AS p, graft_fingerprint('abc') AS fp")
        .head()
      assert(r.getInt(0) === "1234".getBytes.map(_ & 0xff).sum % 8)
      val expected = "abc".getBytes.foldLeft(0L)(
        (h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
      assert(r.getLong(1) === expected)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
