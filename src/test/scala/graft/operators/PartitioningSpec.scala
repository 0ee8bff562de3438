package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PartitioningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("bucketed staging joins with no exchange and no sort") {
    val li = graft.Tables.lineitem(spark, sf)
    val o = graft.Tables.orders(spark, sf)
    Partitioning.stageBucketed(li, "li_b", Seq("l_orderkey"), 8)
    Partitioning.stageBucketed(o, "o_b", Seq("o_orderkey"), 8)
    // at this tiny scale AQE would broadcast; force the SMJ path the
    // bucketing is designed for (at real scale both sides are huge)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b").join(spark.table("o_b"),
        col("l_orderkey") === col("o_orderkey"))
      // force final planning, then check the executed plan shape
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // row count matches the plain join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("salted join returns exactly the plain join result") {
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").alias("k"), col("l_quantity"))
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey").alias("k"), col("o_totalprice"))
    // integer aggregates only: double sums are order-sensitive
    def fingerprint(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)),
        sum(col("l_quantity").cast("long")),
        sum(round(col("o_totalprice") * 100, 0).cast("long")))
      .head()
    val plain = fingerprint(li.join(o, Seq("k")))
    val salted = fingerprint(Partitioning.saltedJoin(li, o, "k", 4))
    assert(salted === plain)
  }
}
