package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All queries read through here so that scan
  * options stay consistent (and so a future real deployment can swap
  * the path scheme for a catalog without touching operators).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events` with `ts` normalized to LongType nanoseconds-since-epoch.
    *
    * The driver has generated this column two ways across refreshes:
    * parquet TIMESTAMP(NANOS) (surfaced as Long via the
    * `legacy.parquet.nanosAsLong` flag) and TIMESTAMP(MICROS)
    * (surfaced as TIMESTAMP_NTZ / TIMESTAMP). Every consumer — the
    * CDC envelope, sessionization, funnels, as-of joins — does
    * integer nano arithmetic, and the DuckDB oracles use the
    * precision-agnostic `epoch_ns(ts)`, so one normalization here
    * keeps both sides stable no matter which spelling the data has.
    * The session timezone is pinned to UTC (GraftSession), making the
    * NTZ→instant cast value-preserving.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", tsNanos(col("ts")))
      case other => sys.error(s"events.ts: unsupported type $other")
    }
  }

  /** Long nanos from a TIMESTAMP / TIMESTAMP_NTZ column (UTC session). */
  def tsNanos(ts: Column): Column =
    unix_micros(ts.cast(TimestampType)) * 1000L
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
