package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark's runtime bloom-filter injection for the selective-dim ⋈
  * fact shape every star join here relies on. At 100 TB the join's
  * fact side cannot afford to shuffle rows the selective side will
  * discard anyway; InjectRuntimeFilter builds a bloom filter from the
  * filtered creation side and applies `might_contain` INSIDE the fact
  * scan's filter, so doomed rows die before the exchange. That
  * injection is an optimizer inference gated by size thresholds and
  * conf flags — a version bump or conf drift could silently drop it,
  * which no correctness oracle would ever notice (the filter is
  * semantically transparent). So pin both halves: the plan carries the
  * filter, and the result is identical with and without it.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  private def withBloomConfs[A](f: => A): A = {
    val confs = Seq(
      // local test data sits far below the 10 GiB production default;
      // zeroing the application-side threshold exercises the same
      // injection path the cluster hits naturally at scale
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // forbid broadcast so the join genuinely shuffles — the shape
      // where the runtime filter pays
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def factJoin() = {
    val orders = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
    graft.Tables.lineitem(spark, sf)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).alias("n"))
  }

  test("a selective dim side injects a bloom filter into the fact scan") {
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true",
      "runtime bloom filters must stay enabled in the session defaults")
    withBloomConfs {
      val plan = factJoin().queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter on the fact side:\n${plan.take(4000)}")
      // the filter must sit on the FACT key, fed by the filtered dim
      assert(plan.contains("might_contain(scalar-subquery"),
        "bloom filter is not a scalar-subquery over the creation side")
    }
  }

  test("the runtime filter is semantically transparent") {
    val expected = factJoin().collect()
    val got = withBloomConfs { factJoin().collect() }
    assert(got.map(_.toSeq).toSet === expected.map(_.toSeq).toSet)
    assert(expected.nonEmpty)
  }
}
