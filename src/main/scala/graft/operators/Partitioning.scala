package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB-scale joins: bucketed staging
  * for shuffle-free co-located joins, and salted joins for skewed
  * keys. Both are layout/shape tools — semantics are identical to the
  * plain operators, which the specs assert.
  */
object Partitioning {

  /** Stage a table bucketed (and sorted) by its join key. A pair of
    * tables staged with the same bucket count joins with NO exchange
    * and NO sort — the shuffle is paid once at write time and
    * amortized over every subsequent join. This is the right call for
    * fact tables joined repeatedly on the same key at large scale.
    */
  def stageBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Salted join for skewed build keys: replicate each small-side row
    * `saltFactor` times and spread the large side's hot keys across
    * the replicas, so one hot key occupies `saltFactor` tasks instead
    * of one straggler. Result is exactly the plain inner equi-join.
    * (AQE's skew-join handles sort-merge cases adaptively; explicit
    * salting is for when the skew is known and extreme, or the join
    * is broadcast-hash where AQE skew handling doesn't apply.)
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    // The salt must be a DETERMINISTIC function of row content:
    // position-derived salts (spark_partition_id/monotonically_
    // increasing_id) change when a lost map task is recomputed, so a
    // stage retry could re-salt rows into reduce partitions that
    // already consumed the old copies — duplicating some matches and
    // dropping others. Hashing every column keeps identical results
    // across retries (identical rows co-locating is acceptable: they
    // carry the same join behavior).
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
