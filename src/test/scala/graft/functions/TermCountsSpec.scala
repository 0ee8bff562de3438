package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 TermCounts kernel bit-equal to the explode + groupBy
  * spelling it replaced in bm25Corpus/tfidfTopK/tx_repetition: same
  * (term, tf) SET per document under split(text, " ") semantics
  * (limit −1 — empty tokens from repeated/leading/trailing spaces are
  * real tokens and are counted).
  */
class TermCountsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  test("matches explode + groupBy(doc_id, term) counts on real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val legacy = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).alias("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).alias("tf"))
    val native = docs
      .select(col("doc_id"), explode(TermCounts(col("text"))).alias("tc"))
      .select(col("doc_id"), col("tc.term").alias("term"),
        col("tc.tf").alias("tf"))
    assert(legacy.exceptAll(native).count() === 0)
    assert(native.exceptAll(legacy).count() === 0)
  }

  test("edge cases: empty string, repeated/leading spaces, nulls") {
    import spark.implicits._
    val got = Seq("a b a", "", "a  b", " x").toDF("s")
      .select(TermCounts(col("s")).alias("tc")).collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1))).toList)
    assert(got(0) === List(("a", 2L), ("b", 1L)))
    assert(got(1) === List(("", 1L))) // split("", -1) is one empty token
    assert(got(2) === List(("a", 1L), ("", 1L), ("b", 1L)))
    assert(got(3) === List(("", 1L), ("x", 1L)))
    val nulls = Seq(Option.empty[String]).toDF("s")
      .select(TermCounts(col("s"))).head()
    assert(nulls.isNullAt(0))
  }
}
