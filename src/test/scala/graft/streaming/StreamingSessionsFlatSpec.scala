package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSessions.Ev

/** The r13 flatMapGroupsWithState sessionizer pinned to the SAME
  * contract as the built-in-session_window twin (StreamingSessionsSpec
  * mirrored test for test): batch s7_sessions replay equality on the
  * real corpus, the gap/merge rule (diff ≤ gap merges, > gap splits),
  * and state eviction on close.
  */
class StreamingSessionsFlatSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"
  private val GapMs = graft.queries.AdvancedQueries.SessionGapMs

  private val FlushUser = Long.MaxValue / 2

  test("flat streaming sessions equal the batch s7_sessions on replay") {
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
    val q = StreamingSessionsFlat.track(in.toDS(), GapMs)
      .writeStream.format("memory").queryName("sessf_eq")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(flush); q.processAllAvailable()
      // one more batch: watermark advances one batch behind the data
      in.addData(Ev(FlushUser, -2L, flush.tMs + 1000L * GapMs))
      q.processAllAvailable()

      val got = spark.table("sessf_eq")
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

      assert(got === expect, "flat streaming session set diverged from batch")
    } finally q.stop()
  }

  // Synthetic events start at B, not 0: FlatMapGroupsWithStateExec
  // drops rows with ts <= watermark (LessThanOrEqual in
  // WatermarkSupport.watermarkExpression), and the initial watermark
  // is 0 — so an event at exactly epoch 0 is "late" to the engine's
  // fMGWS operator on the very first batch (the built-in
  // session_window happens to keep it). Real timelines never sit at
  // epoch 0; the quirk is the engine's late-event contract, not this
  // operator's.
  private val B = 10L

  test("a gap splits; events inside the gap merge into one session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingSessionsFlat.track(in.toDS(), GapMs)
      .writeStream.format("memory").queryName("sessf_gap")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1L, 1L, B), Ev(1L, 2L, B + GapMs), // exactly gap apart merges
        Ev(1L, 3L, B + 2L * GapMs + 1L),      // gap+1 past it splits
        Ev(FlushUser, -1L, 100L * GapMs))
      q.processAllAvailable()
      in.addData(Ev(FlushUser, -2L, 200L * GapMs))
      q.processAllAvailable()
      val got = spark.table("sessf_gap")
        .filter(col("user_id") === 1L)
        .select("start_ms", "end_ms", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((B, B + GapMs, 2L),
        (B + 2L * GapMs + 1L, B + 2L * GapMs + 1L, 1L)), s"got $got")
    } finally q.stop()
  }

  test("a bridging event merges two open sessions into one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingSessionsFlat.track(in.toDS(), GapMs)
      .writeStream.format("memory").queryName("sessf_bridge")
      .outputMode("append").start()
    try {
      // two sessions 2·gap apart, then the bridge between them — all
      // in one batch (the merge pass must unify them regardless of
      // arrival order within the batch)
      in.addData(
        Ev(1L, 1L, B), Ev(1L, 2L, B + 2L * GapMs),
        Ev(1L, 3L, B + GapMs)) // bridge arrives after both ends
      q.processAllAvailable()
      in.addData(Ev(FlushUser, -1L, 100L * GapMs)); q.processAllAvailable()
      in.addData(Ev(FlushUser, -2L, 200L * GapMs)); q.processAllAvailable()
      val got = spark.table("sessf_bridge")
        .filter(col("user_id") === 1L)
        .select("start_ms", "end_ms", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((B, B + 2L * GapMs, 3L)), s"got $got")
    } finally q.stop()
  }

  test("state is bounded: closed sessions leave the store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingSessionsFlat.track(in.toDS(), GapMs)
      .writeStream.format("memory").queryName("sessf_state")
      .outputMode("append").start()
    try {
      in.addData((1 to 50).map(u => Ev(u.toLong, u.toLong, 0L)): _*)
      q.processAllAvailable()
      in.addData(Ev(FlushUser, -1L, 100L * GapMs)); q.processAllAvailable()
      in.addData(Ev(FlushUser, -2L, 200L * GapMs)); q.processAllAvailable()
      val p = q.lastProgress
      val stateRows = Option(p.stateOperators).toSeq.flatten
        .map(_.numRowsTotal).sum
      assert(stateRows <= 1L, s"state rows $stateRows: closed sessions not evicted")
    } finally q.stop()
  }
}
