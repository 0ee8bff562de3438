package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WordShinglesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val hofChain =
    "array_distinct(transform(sequence(1, size(split(s, ' ', -1)) - 2)," +
      " i -> concat(split(s, ' ', -1)[i-1], ' ', split(s, ' ', -1)[i]," +
      " ' ', split(s, ' ', -1)[i+1])))"

  test("matches the HOF chain on real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text").alias("s"))
    val diff = docs.select(
      WordShingles(col("s"), 3).alias("a"),
      expr(hofChain).alias("b"))
      .filter(expr(
        "size(array_except(a, b)) != 0 OR size(array_except(b, a)) != 0" +
          " OR size(a) != size(b)"))
      .count()
    assert(diff === 0)
  }

  test("edge cases: short text, consecutive spaces, nulls") {
    import spark.implicits._
    val df = Seq("a b", "a b c", "a  b c", "", "x").toDF("s")
    val got = df.select(WordShingles(col("s"), 3)).collect()
      .map(_.getSeq[String](0).toList)
    assert(got(0) === Nil)
    assert(got(1) === List("a b c"))
    assert(got(2) === List("a  b", " b c"))  // empty token kept, like split(-1)
    assert(got(3) === Nil)
    assert(got(4) === Nil)
    val nulls = Seq(Option.empty[String]).toDF("s")
      .select(WordShingles(col("s"), 3)).head()
    assert(nulls.isNullAt(0))
  }
}
