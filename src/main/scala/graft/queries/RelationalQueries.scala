package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Relational operators the reference lacks entirely (SURVEY §2
  * "absent operator categories") but that the Spark engine provides —
  * aggregation, joins (broadcast), window functions, top-k, set ops.
  *
  * Scale notes (100 TB): dimension sides (nation/region/customer at
  * dim-scale) are broadcast to avoid shuffling the fact table; all
  * aggregations are partial (map-side combine) by construction; money
  * sums are exact integer cents so results are order-independent and
  * shuffle-safe.
  */
object RelationalQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast(LongType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style full-scan aggregation with map-side combine.
    "rel_q1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(LongType)).alias("sum_qty"),
          sum(cents(col("l_extendedprice"))).alias("price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .alias("revenue_cents"),
          count(lit(1)).alias("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Fact-to-dimension join chain; both dims broadcast → zero shuffle
    // of the orders fact beyond the final (tiny) group-by.
    "rel_join_broadcast" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, d).select("n_nationkey", "n_name")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).alias("n_orders"),
          sum(cents(col("o_totalprice"))).alias("cents"))
        .orderBy("n_name")
    }),

    // Windowed top-k per group with deterministic tie-break.
    "rel_topk" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
          cents(col("o_totalprice")).alias("price_cents"))
        .orderBy("c_mktsegment", "rk")
    }),

    // Set operations: EXCEPT / INTERSECT over distinct key sets.
    "rel_setop" -> ((s, d) => {
      val cn = Tables.customer(s, d).select(col("c_nationkey").alias("nk")).distinct()
      val sn = Tables.supplier(s, d).select(col("s_nationkey").alias("nk")).distinct()
      val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
      val both = cn.intersect(sn).withColumn("tag", lit("both"))
      custOnly.unionAll(both).select("tag", "nk").orderBy("tag", "nk")
    }))

  val oracles: Map[String, String] = Map(
    "rel_q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0)
        |       AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "rel_join_broadcast" ->
      """SELECT n_name,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "rel_topk" ->
      """SELECT c_mktsegment, rk, o_orderkey, price_cents FROM (
        |  SELECT c_mktsegment,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |         ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk,
        |    o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,

    "rel_setop" ->
      """SELECT tag, nk FROM (
        |  SELECT 'cust_only' AS tag, nk FROM (
        |    SELECT DISTINCT c_nationkey AS nk FROM customer
        |    EXCEPT
        |    SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |  UNION ALL
        |  SELECT 'both' AS tag, nk FROM (
        |    SELECT DISTINCT c_nationkey AS nk FROM customer
        |    INTERSECT
        |    SELECT DISTINCT s_nationkey AS nk FROM supplier)) t
        |ORDER BY tag, nk""".stripMargin)
}
