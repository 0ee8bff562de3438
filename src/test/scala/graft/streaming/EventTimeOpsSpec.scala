package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

case class Ev(ts: Timestamp, user: String, v: Long)

class EventTimeOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private def t(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("tumbling window agg with watermark finalizes and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = EventTimeOps.windowedAgg(
      in.toDF(), "ts", watermark = "2 minutes", width = "5 minutes",
      keys = Seq(col("user")),
      aggs = Seq(count(lit(1)).alias("n"), sum(col("v")).alias("s")))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("win_agg").start()
    try {
      // window [10:00,10:05): two events for alice
      in.addData(Ev(t(1), "alice", 1), Ev(t(2), "alice", 2))
      q.processAllAvailable()
      // advance watermark past 10:05+2m → finalizes the first window
      in.addData(Ev(t(9), "bob", 5))
      q.processAllAvailable()
      in.addData(Ev(t(12), "bob", 7))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select(col("window.start").cast("string"), col("user"), col("n"),
          col("s"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(rows.contains(("2024-01-01 10:00:00", "alice", 2L, 3L)))

      // a late row for the finalized window must be dropped
      in.addData(Ev(t(0, 30), "alice", 100))
      q.processAllAvailable()
      val after = spark.table("win_agg")
        .filter(col("user") === "alice").count()
      assert(after === 1, "late row re-opened a finalized window")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups at-least-once delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = EventTimeOps.dedupWithinWatermark(
      in.toDF(), "ts", "10 minutes", Seq("user", "v"))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup").start()
    try {
      in.addData(Ev(t(1), "alice", 1), Ev(t(1), "alice", 1),
        Ev(t(2), "bob", 2))
      q.processAllAvailable()
      in.addData(Ev(t(3), "alice", 1)) // duplicate within horizon
      q.processAllAvailable()
      assert(spark.table("dedup").count() === 2)
    } finally q.stop()
  }

  test("stream-stream interval join pairs within the time bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = EventTimeOps.intervalJoin(
      clicks.toDF().toDF("c_ts", "c_user", "c_v"),
      buys.toDF().toDF("b_ts", "b_user", "b_v"),
      leftKey = "c_user", rightKey = "b_user",
      leftTime = "c_ts", rightTime = "b_ts",
      watermark = "10 minutes", bound = "5 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ij").start()
    try {
      clicks.addData(Ev(t(1), "alice", 1), Ev(t(1), "bob", 2))
      // in-bound purchase for alice (10:04), out-of-bound for bob (10:20)
      buys.addData(Ev(t(4), "alice", 10), Ev(t(20), "bob", 20))
      q.processAllAvailable()
      val rows = spark.table("ij")
        .select("c_user", "c_v", "b_v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set(("alice", 1L, 10L)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched rows with nulls " +
      "after the watermark conclusively closes their interval") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = EventTimeOps.outerIntervalJoin(
      clicks.toDF().toDF("c_ts", "c_user", "c_v"),
      buys.toDF().toDF("b_ts", "b_user", "b_v"),
      leftKey = "c_user", rightKey = "b_user",
      leftTime = "c_ts", rightTime = "b_ts",
      watermark = "2 minutes", bound = "5 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("oij").start()
    try {
      // alice converts in-bound; bob never converts
      clicks.addData(Ev(t(1), "alice", 1), Ev(t(1), "bob", 2))
      buys.addData(Ev(t(4), "alice", 10))
      q.processAllAvailable()
      // the match emits immediately; bob is still pending (his
      // [10:01, 10:06] interval isn't conclusively unmatched yet)
      val matched = spark.table("oij")
        .filter(col("b_v").isNotNull).collect()
        .map(r => (r.getAs[String]("c_user"), r.getAs[Long]("b_v"))).toSet
      assert(matched === Set(("alice", 10L)))
      assert(spark.table("oij").filter(col("b_v").isNull).count() === 0,
        "null match emitted before the watermark closed the interval")

      // advance BOTH watermarks past 10:06 + 2m delay → bob's
      // interval is closed, the null match must flush
      clicks.addData(Ev(t(20), "carol", 3))
      buys.addData(Ev(t(20), "carol", 30))
      q.processAllAvailable()
      // one more batch: outer results flush on the state-cleanup
      // following the watermark advance
      clicks.addData(Ev(t(25), "dave", 4))
      buys.addData(Ev(t(25), "dave", 40))
      q.processAllAvailable()
      val bob = spark.table("oij").filter(col("c_user") === "bob").collect()
      assert(bob.length === 1, s"expected exactly one bob row: ${bob.toSeq}")
      assert(bob.head.isNullAt(bob.head.fieldIndex("b_v")),
        "unconverted click must surface with a null match")
    } finally q.stop()
  }

  test("session windows split on inactivity gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = EventTimeOps.sessionAgg(
      in.toDF(), "ts", watermark = "2 minutes", gap = "3 minutes",
      keys = Seq(col("user")), aggs = Seq(count(lit(1)).alias("n")))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions").start()
    try {
      // alice: events at 10:01,10:02 (one session), then 10:10 (new)
      in.addData(Ev(t(1), "alice", 1), Ev(t(2), "alice", 1),
        Ev(t(10), "alice", 1))
      q.processAllAvailable()
      // push watermark far ahead to close all sessions
      in.addData(Ev(t(30), "zed", 0))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .filter(col("user") === "alice").select("n")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(sessions === Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-static enrichment joins a broadcast dimension, keeps misses") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val dim = Seq(("alice", "gold"), ("bob", "basic"))
      .toDF("d_user", "tier")
    val out = EventTimeOps.enrich(in.toDF(), dim, "user", "d_user")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enriched").start()
    try {
      in.addData(Ev(t(1), "alice", 1), Ev(t(2), "carol", 2))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("user", "tier").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      // known user enriched; unknown user kept with NULL (left join)
      assert(rows === Set(("alice", Some("gold")), ("carol", None)))
    } finally q.stop()
  }
}
