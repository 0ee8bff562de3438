package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingFunnel._

class StreamingFunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"
  private val WindowUs = 6L * 3600 * 1000000 // rel_funnel's 6-hour window

  /** Latest emitted row per user — the documented consumption
    * contract.
    */
  private def latest(table: String): Map[Long, FunnelRow] = {
    import spark.implicits._
    spark.table(table).as[FunnelRow].collect()
      .zipWithIndex
      .groupBy(_._1.userId)
      .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
  }

  test("streaming funnel equals the batch rel_funnel on ordered replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the corpus events in event-time order, chunked into 3 batches
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").alias("t"))
      .as[(Long, String, Long)].collect()
      .map(e => Ev(e._1, e._2, e._3))
      .sortBy(e => (e.t, stageRank(e.eventType)))
    val n = evs.length
    val batches = Seq(evs.slice(0, n / 3), evs.slice(n / 3, 2 * n / 3),
      evs.slice(2 * n / 3, n))

    val in = MemoryStream[Ev]
    val q = StreamingFunnel.track(in.toDS(), WindowUs)
      .writeStream.format("memory").queryName("funnel_eq")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val got = latest("funnel_eq")

      val expect = graft.SparkEntry.queries("rel_funnel")(spark, sf)
        .collect()
        .map { r =>
          val sig = r.getLong(1)
          val clk = if (r.isNullAt(2)) -1L else r.getLong(2)
          val pur = if (r.isNullAt(3)) -1L else r.getLong(3)
          r.getLong(0) -> ((sig, clk, pur, r.getBoolean(4), r.getBoolean(5)))
        }.toMap

      assert(got.keySet === expect.keySet,
        "funnel user set diverged from batch")
      got.foreach { case (u, r) =>
        val (sig, clk, pur, rc, rp) = expect(u)
        assert((r.tSignup, r.tClick, r.tPurchase, r.reachedClick,
          r.reachedPurchase) === ((sig, clk, pur, rc, rp)),
          s"user $u diverged from batch funnel")
      }
    } finally q.stop()
  }

  test("stages advance across micro-batches; redelivery is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingFunnel.track(in.toDS(), WindowUs)
      .writeStream.format("memory").queryName("funnel_cross")
      .outputMode("append").start()
    try {
      in.addData(Ev(1L, "signup", 1000L)); q.processAllAvailable()
      in.addData(Ev(1L, "click", 2000L)); q.processAllAvailable()
      // redelivered click + the completing purchase
      in.addData(Ev(1L, "click", 2000L), Ev(1L, "purchase", 3000L))
      q.processAllAvailable()
      val rows = spark.table("funnel_cross").as[FunnelRow].collect()
      assert(rows.length === 3, "one emission per stage advance")
      val fin = latest("funnel_cross")(1L)
      assert((fin.tSignup, fin.tClick, fin.tPurchase) === ((1000L, 2000L, 3000L)))
      assert(fin.reachedClick && fin.reachedPurchase)
    } finally q.stop()
  }

  test("ordering and windows are enforced") {
    val w = 100L
    // click before signup is ignored
    val s0 = FunnelState(-1L, -1L, -1L)
    assert(advance(s0, Ev(1, "click", 10), w) === s0)
    // click inside the window counts, at the boundary too
    val s1 = advance(s0, Ev(1, "signup", 10), w)
    assert(advance(s1, Ev(1, "click", 110), w).tClick === 110L)
    // click past the window is ignored
    assert(advance(s1, Ev(1, "click", 111), w) === s1)
    // purchase needs the click, not just the signup
    assert(advance(s1, Ev(1, "purchase", 50), w) === s1)
    // first signup anchors; a later one cannot re-anchor
    assert(advance(s1, Ev(1, "signup", 20), w) === s1)
    // same-timestamp click as signup qualifies (batch parity)
    assert(advance(s1, Ev(1, "click", 10), w).tClick === 10L)
  }

  test("state is bounded: three longs per user regardless of event count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingFunnel.track(in.toDS(), WindowUs)
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode("append").start()
    try {
      // thousands of post-conversion events must not grow state or
      // re-emit
      in.addData(Ev(7L, "signup", 1L), Ev(7L, "click", 2L),
        Ev(7L, "purchase", 3L))
      q.processAllAvailable()
      val before = spark.table("funnel_state").count()
      in.addData((1 to 2000).map(i => Ev(7L, "click", 10L + i)): _*)
      q.processAllAvailable()
      assert(spark.table("funnel_state").count() === before,
        "completed funnel re-emitted on irrelevant events")
      val p = q.lastProgress
      val stateRows = Option(p.stateOperators).toSeq.flatten
        .map(_.numRowsTotal).sum
      assert(stateRows === 1L, s"state rows $stateRows != 1 user")
    } finally q.stop()
  }
}
