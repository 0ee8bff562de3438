package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GroupRank against the semantics it replaces: for every input, the
  * distributed (range partition + local window + broadcast offsets)
  * rank/cumsum must equal the plain `Window.partitionBy(group)`
  * result — the single-task-per-group shape we can still afford to
  * run at spec scale. Edge cases pinned: a group smaller than one
  * partition, a group spanning many partitions, duplicate order keys
  * broken by a tiebreaker, localLimit losslessness.
  */
class GroupRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  import scala.jdk.CollectionConverters._

  // 3 groups with very different sizes (1, 40, 400) so range
  // partitions both split groups and hold several whole ones;
  // values collide across rows so the id tiebreaker matters
  private def frame() = {
    import spark.implicits._
    val rows =
      Seq((0L, "solo", 7L)) ++
        (1L to 40L).map(i => (i, "mid", i % 5)) ++
        (41L to 440L).map(i => (i, "big", i % 11))
    rows.toDF("id", "grp", "v")
  }

  test("rank + group size match the single-window reference") {
    val df = frame()
    val got = GroupRank.rank(df, "grp", Seq(col("v").desc, col("id").asc))
      .select("id", "rn", "grp_n")
    val w = Window.partitionBy("grp").orderBy(col("v").desc, col("id").asc)
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("grp_n", count(lit(1)).over(Window.partitionBy("grp")))
      .select("id", "rn", "grp_n")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "distributed rank diverged from the reference window")
    assert(got.count() === df.count())
  }

  test("localLimit is lossless for global ranks <= k") {
    val df = frame()
    val full = GroupRank.rank(df, "grp", Seq(col("v").asc, col("id").asc))
      .filter(col("rn") <= 7).select("id", "rn", "grp_n")
    val limited = GroupRank.rank(df, "grp",
        Seq(col("v").asc, col("id").asc), localLimit = Some(7))
      .filter(col("rn") <= 7).select("id", "rn", "grp_n")
    assert(limited.except(full).isEmpty && full.except(limited).isEmpty)
    // and the pruned path really went through a rank-limit plan
    val plan = GroupRank.rank(df, "grp",
        Seq(col("v").asc, col("id").asc), localLimit = Some(7))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("WindowGroupLimit"),
      "localLimit did not trigger rank-limit pushdown")
  }

  test("runningSum matches the single-window cumulative sum") {
    val df = frame()
    val got = GroupRank.runningSum(df, "grp", Seq(col("id").asc), "v")
      .select("id", "run")
    val w = Window.partitionBy("grp").orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("run", sum(col("v")).over(w)).select("id", "run")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("randomized: rank and runningSum match the reference window") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // deterministic
    for (trial <- 1 to 4) {
      val nGroups = 1 + rnd.nextInt(7)
      val rows = (1L to (200 + rnd.nextInt(1500)).toLong).map { i =>
        (i, s"g${rnd.nextInt(nGroups)}", rnd.nextInt(9).toLong)
      }
      val df = rows.toDF("id", "grp", "v") // heavy value ties; id breaks them
      val got = GroupRank.rank(df, "grp", Seq(col("v").asc, col("id").asc))
        .select("id", "rn", "grp_n")
      val w = Window.partitionBy("grp").orderBy(col("v").asc, col("id").asc)
      val want = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("grp_n", count(lit(1)).over(Window.partitionBy("grp")))
        .select("id", "rn", "grp_n")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"trial $trial: rank diverged")
      val gotRun = GroupRank.runningSum(df, "grp", Seq(col("id").asc), "v")
        .select("id", "run")
      val wRun = Window.partitionBy("grp").orderBy(col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wantRun = df.withColumn("run", sum(col("v")).over(wRun))
        .select("id", "run")
      assert(gotRun.except(wantRun).isEmpty && wantRun.except(gotRun).isEmpty,
        s"trial $trial: runningSum diverged")
    }
  }

  test("ntileFromRank equals the ntile window for every (n, k) shape") {
    import spark.implicits._
    for (k <- Seq(2, 3, 4, 7); n <- (1 to 30) ++ Seq(101, 1000)) {
      val df = (1L to n.toLong).map(i => (i, i)).toDF("id", "v")
      val w = Window.orderBy(col("v").asc, col("id").asc)
      val cmp = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("want", ntile(k).over(w).cast("long"))
        .withColumn("got",
          GroupRank.ntileFromRank(k, col("rn"), lit(n.toLong)))
        .filter(col("got") =!= col("want"))
      assert(cmp.isEmpty, s"ntileFromRank($k) diverged at n=$n: " +
        cmp.limit(3).collect().mkString(", "))
    }
  }

  test("every partition id contributes consistent offsets (no AQE drift)") {
    // the correctness invariant the Scaladoc documents: the range
    // exchange is REPARTITION_BY_NUM, so the two consumers see the
    // same spark_partition_id assignment. If AQE ever coalesced one
    // consumer and not the other, ranks would duplicate or gap —
    // assert rn is exactly a permutation of 1..n per group.
    val got = GroupRank.rank(frame(), "grp",
      Seq(col("v").asc, col("id").asc))
    val perGroup = got.groupBy("grp")
      .agg(count(lit(1)).alias("n"), min("rn").alias("lo"),
        max("rn").alias("hi"), countDistinct("rn").alias("d"))
      .collect()
    perGroup.foreach { r =>
      val (n, lo, hi, d) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo === 1L && hi === n && d === n,
        s"group ${r.getString(0)}: ranks not a permutation of 1..$n")
    }
  }
}
