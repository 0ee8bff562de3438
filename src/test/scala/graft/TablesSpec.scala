package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.events`'s `ts` normalization against every schema
  * spelling the driver's testdata generator has produced:
  * TIMESTAMP(NANOS) (read as Long under the nanosAsLong legacy flag),
  * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ), and a plain BIGINT. A
  * refresh of /root/testdata flipping between them must never change
  * what downstream nano arithmetic sees (2026-08-13: a refresh did
  * exactly that and broke 14 tests at once).
  */
class TablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  // one event at a fixed instant: 2024-03-01T12:34:56.789012 UTC
  private val Micros = 1709296496789012L

  private def writeEvents(dir: String, tsType: DataType): Unit = {
    import spark.implicits._
    val base = Seq((1L, Micros, 10L, "click", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val ts = tsType match {
      case LongType => (col("us") * 1000L).alias("ts") // nanos as long
      case TimestampNTZType =>
        timestamp_micros(col("us")).cast(TimestampNTZType).alias("ts")
      case TimestampType => timestamp_micros(col("us")).alias("ts")
      case other => fail(s"unhandled test type $other")
    }
    base.select(col("event_id"), ts, col("user_id"), col("event_type"),
        col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readTs(dir: String): Long =
    Tables.events(spark, dir).select(col("ts")).head().getLong(0)

  test("every ts spelling normalizes to the same Long nanos") {
    val tmp = Files.createTempDirectory("tables_ts").toString
    for ((t, name) <- Seq(LongType -> "long", TimestampNTZType -> "ntz",
        TimestampType -> "ltz")) {
      val dir = s"$tmp/$name"
      writeEvents(dir, t)
      assert(readTs(dir) === Micros * 1000L,
        s"ts stored as $name must surface as nanos-since-epoch")
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt === LongType, s"ts stored as $name must surface as Long")
    }
  }

  test("the live testdata reads as Long nanos in a sane range") {
    val ts = Tables.events(spark, "/root/testdata/sf0.001")
      .agg(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (ts.getLong(0), ts.getLong(1))
    // nanos since epoch for any date between 2001 and 2060 — a
    // micros-misread (1000× too small) or a seconds-misread would
    // fall far outside
    val y2001 = 1000000000L * 1000000000L
    val y2060 = 2840140800L * 1000000000L
    assert(lo >= y2001 && hi <= y2060,
      s"events.ts range [$lo, $hi] is not nanos-since-epoch")
  }
}
