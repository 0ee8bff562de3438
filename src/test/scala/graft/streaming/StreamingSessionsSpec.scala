package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSessions._

class StreamingSessionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"
  private val GapMs = graft.queries.AdvancedQueries.SessionGapMs

  // a user id far outside the corpus whose lone far-future event
  // advances the global watermark so every corpus session closes
  private val FlushUser = Long.MaxValue / 2

  test("streaming sessions equal the batch s7_sessions on replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000").alias("ms"))
      .as[(Long, Long, Long)].collect()
      .map(e => Ev(e._1, e._2, e._3))
      .sortBy(_.tMs)
    val n = evs.length
    val batches = Seq(evs.slice(0, n / 2), evs.slice(n / 2, n))
    val flush = Ev(FlushUser, -1L, evs.map(_.tMs).max + 1000L * GapMs)

    val in = MemoryStream[Ev]
    val q = StreamingSessions.track(in.toDS(), GapMs)
      .writeStream.format("memory").queryName("sess_eq")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(flush); q.processAllAvailable()
      // one more batch: watermark advances one batch behind the data
      in.addData(Ev(FlushUser, -2L, flush.tMs + 1000L * GapMs))
      q.processAllAvailable()

      val got = spark.table("sess_eq")
        .filter(col("user_id") =!= FlushUser)
        .select("user_id", "start_ms", "end_ms", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet

      val expect = graft.SparkEntry.queries("s7_sessions")(spark, sf)
        .select("user_id", "start_ms", "end_ms", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet

      assert(got === expect, "streaming session set diverged from batch")
    } finally q.stop()
  }

  test("a gap splits; events inside the gap merge into one session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingSessions.track(in.toDS(), GapMs)
      .writeStream.format("memory").queryName("sess_gap")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1L, 1L, 0L), Ev(1L, 2L, GapMs), // exactly gap apart merges
        // (batch splits only on diff > gap); gap+1 past it splits
        Ev(1L, 3L, 2L * GapMs + 1L),
        Ev(FlushUser, -1L, 100L * GapMs))
      q.processAllAvailable()
      in.addData(Ev(FlushUser, -2L, 200L * GapMs))
      q.processAllAvailable()
      val got = spark.table("sess_gap")
        .filter(col("user_id") === 1L)
        .select("start_ms", "end_ms", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((0L, GapMs, 2L), (2L * GapMs + 1L, 2L * GapMs + 1L, 1L)),
        s"got $got")
    } finally q.stop()
  }

  test("state is bounded: closed sessions leave the store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingSessions.track(in.toDS(), GapMs)
      .writeStream.format("memory").queryName("sess_state")
      .outputMode("append").start()
    try {
      in.addData((1 to 50).map(u => Ev(u.toLong, u.toLong, 0L)): _*)
      q.processAllAvailable()
      in.addData(Ev(FlushUser, -1L, 100L * GapMs)); q.processAllAvailable()
      in.addData(Ev(FlushUser, -2L, 200L * GapMs)); q.processAllAvailable()
      val p = q.lastProgress
      val stateRows = Option(p.stateOperators).toSeq.flatten
        .map(_.numRowsTotal).sum
      // the 50 corpus sessions closed and were evicted; at most the
      // flush user's open session remains
      assert(stateRows <= 1L, s"state rows $stateRows: closed sessions not evicted")
    } finally q.stop()
  }
}
