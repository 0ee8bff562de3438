package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed rank / running-sum within a LOW-CARDINALITY group —
  * the scale-safe replacement for `Window.partitionBy(dimensionKey)`.
  *
  * A window partitioned on a key with a handful of distinct values
  * (order priority, language, market segment) executes the whole
  * corpus as one sorted task per key value: fine at sf0.1, fatal at
  * 100 TB. The classic distributed fix decomposes the global
  * per-group order into (a) a range partition that makes each group's
  * rows contiguous and ordered ACROSS partitions, (b) a per-partition
  * local rank/cumsum (every partition bounded by the shuffle target
  * size), and (c) a tiny `partitions × groups` offset table —
  * computed by a map-side-combined aggregate, broadcast back — that
  * lifts local positions to global ones. Rank statistics
  * (ntile/percent_rank/cume_dist) then derive arithmetically from
  * `(rn, grp_n)`; no task ever holds more than one range partition.
  *
  * Correctness invariants:
  *  - `repartitionByRange` is called with an EXPLICIT partition count:
  *    that pins the shuffle origin to REPARTITION_BY_NUM, which AQE
  *    never coalesces or skew-splits, so `spark_partition_id()` is
  *    identical for the exchange's two consumers (the local window and
  *    the offset aggregate) even when the exchange is not physically
  *    reused. Range bounds themselves are sampled with a
  *    partition-index-derived seed, so recomputation is deterministic.
  *  - the range clustering key is `group +: order`: rows of one group
  *    occupy a contiguous run of partitions, ordered, so
  *    `offset(pid, g) = Σ count(pid' < pid, g)` is the exact global
  *    rank base.
  *  - `order` must be a total order within each group (include a
  *    unique tiebreak column) or local ranks are nondeterministic.
  *
  * The local window partitions by `(partition id, group)` — key
  * cardinality O(partitions), scaling WITH the cluster — and the two
  * offset-table windows run over an aggregated input of
  * `partitions × groups` rows. `PlanAuditSpec`'s low-cardinality-
  * window rule mechanically distinguishes both shapes from the
  * anti-pattern this object exists to kill.
  */
object GroupRank {

  private def ranged(df: DataFrame, group: String,
      order: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(parts, (col(group) +: order): _*)
      .withColumn("__pid", spark_partition_id())
  }

  /** Per-(pid, group) prefix table: `__off` = rows (or `value` sum)
    * in strictly-earlier partitions of the same group; `__grp` = the
    * group total. Input is the aggregated tiny table, so the windows
    * here cost nothing and pass the plan audit's aggregate exemption.
    */
  private def offsets(counts: DataFrame, group: String,
      cnt: String): DataFrame = {
    val offW = Window.partitionBy(col(group)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__off", sum(col(cnt)).over(offW) - col(cnt))
      .withColumn("__grp",
        sum(col(cnt)).over(Window.partitionBy(col(group))))
      .select(col("__pid"), col(group), col("__off"), col("__grp"))
  }

  /** Adds `rn` (1-based Long global rank within `group` under `order`)
    * and `grp_n` (Long group size) to `df`.
    *
    * `localLimit`: when only ranks ≤ k are consumed downstream, pass
    * Some(k) — global rank ≥ local rank, so pruning local ranks > k is
    * lossless, and the `row_number ≤ k` filter lets Spark insert a
    * WindowGroupLimit that keeps per-partition state at k rows per
    * group instead of sorting whole partitions through the window
    * buffer.
    */
  def rank(df: DataFrame, group: String, order: Seq[Column],
      localLimit: Option[Int] = None): DataFrame = {
    val r = ranged(df, group, order)
    val localW = Window.partitionBy(col("__pid"), col(group))
      .orderBy(order: _*)
    val local0 = r.withColumn("__lrn",
      row_number().over(localW).cast(LongType))
    val local = localLimit.fold(local0)(k => local0.filter(col("__lrn") <= k))
    val counts = r.groupBy(col("__pid"), col(group))
      .agg(count(lit(1)).alias("__cnt"))
    local.join(broadcast(offsets(counts, group, "__cnt")),
        Seq("__pid", group))
      .withColumn("rn", col("__off") + col("__lrn"))
      .withColumnRenamed("__grp", "grp_n")
      .drop("__pid", "__lrn", "__off")
  }

  /** Exact integral division on Long columns (`a div b`, not the
    * double-producing `/`).
    */
  private def idiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.toColumn(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        graftshim.toExpression(a), graftshim.toExpression(b)))
  }

  /** SQL-standard `ntile(k)` derived arithmetically from a 1-based
    * rank `rn` and group size `n` (both Long): the first `n mod k`
    * buckets take `ceil(n/k)` rows, the rest `floor(n/k)` — no window
    * evaluation, so it rides on [[rank]]'s distributed output.
    * Matches Spark's and DuckDB's ntile for every (n, k), including
    * n < k (each row its own bucket). Returns Long.
    */
  def ntileFromRank(k: Int, rn: Column, n: Column): Column = {
    val q = idiv(n, lit(k.toLong)) // floor(n / k)
    val r = n % k
    val cut = (q + 1L) * r // rows covered by the big buckets
    when(n < k, rn)
      .when(rn <= cut, idiv(rn - 1L, q + 1L) + 1L)
      .otherwise(r + idiv(rn - cut - 1L, q) + 1L)
  }

  /** Adds `run` — the inclusive running sum of `value` within `group`
    * under `order` — to `df`. Same plan shape as [[rank]] with the
    * per-partition count replaced by a per-partition sum.
    */
  def runningSum(df: DataFrame, group: String, order: Seq[Column],
      value: String): DataFrame = {
    val r = ranged(df, group, order)
    val localW = Window.partitionBy(col("__pid"), col(group))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = r.withColumn("__lcum", sum(col(value)).over(localW))
    val totals = r.groupBy(col("__pid"), col(group))
      .agg(sum(col(value)).alias("__tot"))
    local.join(broadcast(offsets(totals, group, "__tot")),
        Seq("__pid", group))
      .withColumn("run", col("__off") + col("__lcum"))
      .drop("__pid", "__lcum", "__off", "__grp")
  }
}
