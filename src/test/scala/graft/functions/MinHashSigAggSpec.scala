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

  test("empty-input groups yield NULL like built-in min(), not sentinels") {
    // an all-sentinel signature would band every empty group into the
    // same LSH bucket; NULL is the honest answer for "no hashes seen"
    import spark.implicits._
    val row = Seq((1L, Option.empty[Long])).toDF("g", "h")
      .groupBy("g").agg(MinHashSig(col("h"), K, P, As, Bs).alias("sig"))
      .head()
    assert(row.isNullAt(1))
  }

  test("unreduced 60-bit inputs are reduced mod P, not overflowed") {
    // raw h60 output (< 2^60) times a ~2^30 coefficient overflows
    // int64; the aggregate must reduce first so the SQL surface is
    // safe to call without a pre-pmod
    import spark.implicits._
    val raw = Seq(1152921504606846975L /* 2^60-1 */, 987654321987L)
    val got = raw.toDF("h")
      .agg(MinHashSig(col("h"), K, P, As, Bs).alias("sig"))
      .head().getSeq[Long](0)
    assert(got === ref(raw.map(x => x % P)))
    assert(got.forall(v => v >= 0 && v < P))
  }

  test("negative inputs land in [0, P) via floorMod, not negative residues") {
    // signed % would hand a negative bigint a negative residue that
    // beats every legitimate minimum and silently corrupts the whole
    // signature; floorMod keeps any input in-range
    import spark.implicits._
    val vals = Seq(-1L, Long.MinValue, -987654321987L, 42L)
    val got = vals.toDF("h")
      .agg(MinHashSig(col("h"), K, P, As, Bs).alias("sig"))
      .head().getSeq[Long](0)
    assert(got === ref(vals.map(x => java.lang.Math.floorMod(x, P))))
    assert(got.forall(v => v >= 0 && v < P))
  }

  test("non-bigint input fails analysis (or widens) instead of runtime CCE") {
    import spark.implicits._
    // int widens via the implicit cast — must produce the same result
    // as the pre-widened long input
    val got = Seq(4, 99).toDF("h")
      .agg(MinHashSig(col("h"), K, P, As, Bs).alias("sig"))
      .head().getSeq[Long](0)
    assert(got === ref(Seq(4L, 99L)))
    // an array column is not coercible to bigint: analysis must reject
    // it with an AnalysisException, not a ClassCastException mid-job
    val ex = intercept[Exception] {
      Seq(Seq(1L)).toDF("h")
        .agg(MinHashSig(col("h"), K, P, As, Bs).alias("sig"))
        .collect()
    }
    assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException],
      s"expected AnalysisException, got ${ex.getClass}: ${ex.getMessage}")
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
