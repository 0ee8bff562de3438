package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused broadcast-model scorer against the declarative
  * aggregate/element_at/h60 spelling it replaced — the streaming
  * scorers' per-row sums must be bit-identical to what the batch
  * queries' Column-level h60 computes (and therefore to the DuckDB
  * oracles' md5 replay).
  */
class H60BucketSumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  // deterministic "random" docs: mix()-hashed word streams of varied
  // lengths, plus the edge shapes (empty text, single word, repeated
  // word, consecutive spaces → empty tokens)
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val docs: Seq[(Long, String)] =
    (0 until 40).map { i =>
      val len = 1 + (i * 7) % 23
      (i.toLong, (0 until len)
        .map(w => s"w${math.floorMod(mix(i * 64L + w), 997L)}")
        .mkString(" "))
    } ++ Seq(
      (100L, ""),
      (101L, "lonely"),
      (102L, ("echo " * 12).trim),
      (103L, "a  b   c") // empty tokens from double spaces
    )

  private val table: IndexedSeq[Long] =
    IndexedSeq.tabulate(64)(i => mix(i.toLong) % 1000000L)

  private def declarative(k: Int) = {
    import org.apache.spark.sql.Column
    val arr = typedLit(table)
    val ws = split(col("text"), " ")
    val n1 = greatest(size(ws) - (k - 1), lit(0))
    val grams: Column =
      if (k == 1) ws
      else zip_with(slice(ws, lit(1), n1), slice(ws, lit(2), n1),
        (a, b) => concat(a, lit(" "), b))
    aggregate(grams, lit(0L), (acc, g) => acc + element_at(arr,
      (pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"),
        lit(64L)) + 1L).cast("int")))
  }

  test("unigram sums equal the aggregate/element_at/h60 spelling") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      H60BucketSum(col("text"), table, 1).alias("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select(col("doc_id"), declarative(1).alias("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.exists(_ != 0L))
  }

  test("bigram sums equal the declarative spelling incl. short docs") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      H60BucketSum(col("text"), table, 2).alias("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select(col("doc_id"), declarative(2).alias("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // a 1-token doc has no bigrams: sums to zero on both paths
    assert(got(101L) === 0L)
  }
}
