package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashSigAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val P = 1073741789L
  private val K = 4
  private val As = Seq(3L, 5L, 7L, 11L)
  private val Bs = Seq(13L, 17L, 19L, 23L)

  private def ref(xs: Seq[Long]): Seq[Long] =
    (0 until K).map(i => xs.map(x => (As(i) * x + Bs(i)) % P).min)

  test("signature equals the per-permutation minimum") {
    import spark.implicits._
    val xs = Seq(4L, 99L, 1234567L, 0L, P - 1)
    val got = xs.toDF("h").repartition(3)
      .agg(MinHashSig(col("h"), K, P, As, Bs).alias("sig"))
      .head().getSeq[Long](0)
    assert(got === ref(xs))
  }

  test("empty-input groups keep the sentinel maxima") {
    import spark.implicits._
    val got = Seq((1L, Option.empty[Long])).toDF("g", "h")
      .groupBy("g").agg(MinHashSig(col("h"), K, P, As, Bs).alias("sig"))
      .head().getSeq[Long](1)
    assert(got === Seq.fill(K)(Long.MaxValue))
  }

  test("grouped signatures match per-group reference across partitions") {
    import spark.implicits._
    val data = (0L until 1000L).map(x => (x % 7, x * 31 % P))
    val got = data.toDF("g", "h").repartition(8)
      .groupBy("g").agg(MinHashSig(col("h"), K, P, As, Bs).alias("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = data.groupBy(_._1).map { case (g, vs) => g -> ref(vs.map(_._2)) }
    assert(got === want)
  }
}
