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

  /** The full normalized-schema contract, one pin per table: column
    * names, order, and types as every query and oracle assumes them.
    * A driver testdata refresh that changes ANY column silently (as
    * the 2026-08-13 one did to `events.ts`) must fail here, in one
    * place with a readable diff — not as a scatter of
    * DATATYPE_MISMATCH failures across the query suites. Timestamp
    * columns accept both TIMESTAMP spellings (NTZ vs LTZ — parquet
    * isAdjustedToUTC flips between generator versions; the session
    * timezone is pinned UTC so both cast identically), everything
    * else is exact.
    */
  private val TsLike: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private val expectedSchemas: Map[String, Seq[(String, Any)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TsLike, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TsLike),
    // events is pinned POST-normalization: ts must always be Long nanos
    "events" -> Seq("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("all ten live tables match the pinned normalized schema") {
    val loaders: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("region" -> Tables.region, "nation" -> Tables.nation,
        "customer" -> Tables.customer, "supplier" -> Tables.supplier,
        "part" -> Tables.part, "orders" -> Tables.orders,
        "lineitem" -> Tables.lineitem, "events" -> Tables.events,
        "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    assert(loaders.keySet === Tables.names.toSet)
    val diffs = Tables.names.flatMap { t =>
      val got = loaders(t)(spark, "/root/testdata/sf0.001").schema
        .map(f => f.name -> f.dataType)
      val want = expectedSchemas(t)
      if (got.size != want.size ||
          got.zip(want).exists { case ((gn, gt), (wn, wt)) =>
            gn != wn || (wt match {
              case s: Set[_] => !s.asInstanceOf[Set[DataType]].contains(gt)
              case d: DataType => gt != d
              case other => fail(s"bad expectation $other")
            })
          })
        Some(s"$t:\n  got  $got\n  want $want")
      else None
    }
    assert(diffs.isEmpty,
      "testdata refresh changed table schemas:\n" + diffs.mkString("\n"))
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
