package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingRetention._

class StreamingRetentionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("credit counts equal the batch rel_retention on ordered replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").alias("t"))
      .as[(Long, String, Long)].collect()
      .map(e => Ev(e._1, e._2, e._3))
      .sortBy(e => (e.t, if (e.eventType == "signup") 0 else 1))
    val n = evs.length
    val batches = Seq(evs.slice(0, n / 3), evs.slice(n / 3, 2 * n / 3),
      evs.slice(2 * n / 3, n))

    val in = MemoryStream[Ev]
    val q = StreamingRetention.track(in.toDS())
      .writeStream.format("memory").queryName("ret_eq")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // the documented consumption: count credits per (cohort, offset)
      val got = spark.table("ret_eq").as[Credit].collect()
        .groupBy(c => (c.cohortDay, c.offset))
        .map { case (k, cs) => k -> cs.length.toLong }

      val expect = graft.SparkEntry.queries("rel_retention")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      assert(got === expect, "retention matrix diverged from batch")
    } finally q.stop()
  }

  test("a (user, offset) pair is credited at most once, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingRetention.track(in.toDS())
      .writeStream.format("memory").queryName("ret_once")
      .outputMode("append").start()
    try {
      val day = DayUs
      in.addData(Ev(1L, "signup", 10L)); q.processAllAvailable()
      in.addData(Ev(1L, "click", 20L), Ev(1L, "click", 30L),
        Ev(1L, "view", day + 15L))
      q.processAllAvailable()
      // redelivery of everything
      in.addData(Ev(1L, "signup", 10L), Ev(1L, "click", 20L),
        Ev(1L, "view", day + 15L))
      q.processAllAvailable()
      val got = spark.table("ret_once").as[Credit].collect().toSeq
      assert(got.sortBy(_.offset) === Seq(Credit(0L, 0L, 1L),
        Credit(0L, 1L, 1L)),
        "offsets 0 and 1 must each be credited exactly once")
    } finally q.stop()
  }

  test("pre-signup events and offsets past the window are ignored") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingRetention.track(in.toDS(), maxOffset = 7L)
      .writeStream.format("memory").queryName("ret_win")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(2L, "click", 5L), // before any signup: no credit
        Ev(2L, "signup", 10L), // credits offset 0
        Ev(2L, "view", 8L * DayUs + 10L)) // offset 8 > 7: no credit
      q.processAllAvailable()
      val got = spark.table("ret_win").as[Credit].collect().toSeq
      assert(got === Seq(Credit(0L, 0L, 2L)))
    } finally q.stop()
  }

  test("state is two longs per user: one state row after many events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingRetention.track(in.toDS())
      .writeStream.format("memory").queryName("ret_state")
      .outputMode("append").start()
    try {
      in.addData(Ev(3L, "signup", 1L)); q.processAllAvailable()
      in.addData((1 to 500).map(i => Ev(3L, "click", 1L + i)): _*)
      q.processAllAvailable()
      val p = q.lastProgress
      val stateRows = Option(p.stateOperators).toSeq.flatten
        .map(_.numRowsTotal).sum
      assert(stateRows === 1L, s"state rows $stateRows != 1 user")
    } finally q.stop()
  }
}
