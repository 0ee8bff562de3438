package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused positional-gram-hash expression against the
  * interpreted HOF derivation it replaced (the span family's staged
  * index rows must be bit-identical to the oracle's md5 replay).
  */
class PosGramHashesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val docs = Seq(
    (1L, ("alpha " * 20).trim),                        // repeated word
    (2L, (1 to 40).map(i => s"w$i").mkString(" ")),    // all distinct
    (3L, (1 to 16).map(i => s"t$i").mkString(" ")),    // exactly k words
    (4L, "short doc under sixteen words here"),        // < k words
    (5L, ""),                                          // empty text
    (6L, "a  b " + (1 to 20).map(i => s"x$i").mkString(" ")) // double space
  )

  test("fused expression equals the HOF transform/slice/md5 chain") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val fused = df
      .select(col("doc_id"), explode(PosGramHashes(col("text"), 16)).alias("sg"))
      .select(col("doc_id"), col("sg.p").alias("p"), col("sg.gh").alias("gh"))
    val hof = df
      .select(col("doc_id"), split(col("text"), " ").alias("w"))
      .filter(size(col("w")) >= 16)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 15), " +
          "i -> struct(i AS p, array_join(slice(w, i, 16), ' ') AS g))"))
        .alias("sg"))
      .select(col("doc_id"), col("sg.p").cast("long").alias("p"),
        conv(substring(md5(col("sg.g")), 1, 15), 16, 10).cast("long")
          .alias("gh"))
    val f = fused.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val h = hof.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(f === h)
    assert(f.nonEmpty)
  }

  test("under-k and empty docs yield no rows") {
    import spark.implicits._
    val df = Seq((4L, "short doc"), (5L, "")).toDF("doc_id", "text")
    val n = df.select(explode(PosGramHashes(col("text"), 16))).count()
    assert(n === 0L)
  }
}
