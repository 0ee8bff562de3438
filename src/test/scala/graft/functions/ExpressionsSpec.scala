package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private def refByteSum(s: String, n: Int): Int =
    (s.getBytes("UTF-8").map(x => (x & 0xff).toLong).sum % n).toInt

  private def refFingerprint(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)

  private val samples = Seq(
    "", "a", "hello world", "1234", "þorn-ünïcode-字符",
    "{\"_id\": {\"$oid\": \"6692b4a31ede014d28852865\"}}",
    "x" * 10000)

  test("ByteSumMod matches reference semantics incl. unicode and empty") {
    import spark.implicits._
    val df = samples.toDF("s")
    for (n <- Seq(1, 2, 7, 8)) {
      val got = df.select(ByteSumMod(col("s"), n)).collect().map(_.getInt(0))
      assert(got.toSeq === samples.map(refByteSum(_, n)),
        s"mismatch for n=$n")
    }
  }

  test("Fingerprint matches the reference fold, null-safe") {
    import spark.implicits._
    val df = (samples :+ null).toDF("s")
    val got = df.select(Fingerprint(col("s"))).collect()
    val expected = samples.map(refFingerprint)
    assert(got.dropRight(1).map(_.getLong(0)).toSeq === expected)
    assert(got.last.isNullAt(0))
  }

  test("expressions survive codegen fallback (interpreted path)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val got = samples.toDF("s")
        .select(ByteSumMod(col("s"), 8), Fingerprint(col("s")))
        .collect()
      assert(got.map(_.getInt(0)).toSeq === samples.map(refByteSum(_, 8)))
      assert(got.map(_.getLong(1)).toSeq === samples.map(refFingerprint))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
