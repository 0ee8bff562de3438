package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.streaming.StreamingLateness._

/** Pins the at-ingest lateness monitor: the aggregated late-arrival
  * feed equals the batch cdc_ooo_profile's late columns on the real
  * corpus, redelivery emits nothing, and per-key max-event-time state
  * carries across micro-batches under RocksDB.
  */
class StreamingLatenessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("aggregated late feed equals the batch profile on perturbed corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // The driver testdata is perfectly key-ordered (zero inversions),
    // so perturb it deterministically: every third event's time slips
    // back by (event_id mod 20 + 1) hours — the corpus's intra-key
    // event spacing is hours (median ~7.7 h), so the slips produce a
    // mix of real inversions and still-on-time arrivals with varied
    // depths. Both sides see the SAME perturbed rows.
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id").alias("key"),
        coalesce(col("event_type"), lit("")).alias("op_type"), col("ts"))
      .as[Ev].collect().sortBy(_.event_id)
      .map(e =>
        if (e.event_id % 3 == 0)
          e.copy(ts = e.ts - (e.event_id % 20 + 1) * 3600L * 1000000000L)
        else e)

    val batch = graft.queries.CdcQueries.oooProfileOf(
      evs.toSeq.toDF().withColumnRenamed("key", "user_id"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .filter(_._2._1 > 0L) // ops with no late events emit no feed rows
      .toMap

    val in = MemoryStream[Ev]
    val q = observe(in.toDS())
      .writeStream.format("memory").queryName("late_parity")
      .outputMode("append").start()
    try {
      evs.grouped(evs.length / 4 + 1).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("late_parity").as[Late].collect()
      val byOp = streamed.groupBy(_.op_type).map { case (op, ls) =>
        (op, (ls.length.toLong, ls.map(_.late_ms).max,
          ls.map(_.key).distinct.length.toLong))
      }
      assert(byOp === batch,
        "per-op (n_late, max_late_ms, n_late_users) must match the batch profile")
      assert(streamed.nonEmpty,
        "the perturbation must produce late arrivals")
    } finally q.stop()
  }

  test("redelivery below the high-water emits nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = observe(in.toDS())
      .writeStream.format("memory").queryName("late_replay")
      .outputMode("append").start()
    try {
      // id 2 arrives with an EARLIER event time than id 1 → late 1 ms
      in.addData(Ev(1L, 7L, "u", 5000000L), Ev(2L, 7L, "u", 4000000L))
      q.processAllAvailable()
      assert(spark.table("late_replay").as[Late].collect().toSet ===
        Set(Late(7L, "u", 2L, 1L)))
      // resume-token replay of the same ids: no duplicate observation
      in.addData(Ev(2L, 7L, "u", 4000000L)); q.processAllAvailable()
      assert(spark.table("late_replay").count() === 1)
      // a fresh on-time arrival still emits nothing
      in.addData(Ev(3L, 7L, "u", 6000000L)); q.processAllAvailable()
      assert(spark.table("late_replay").count() === 1)
    } finally q.stop()
  }

  test("within the TTL, the event-time variant equals observe()") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same perturbed corpus as the batch-parity test; the watermark
    // delay exceeds the max slip (20 h) and the TTL exceeds the
    // stream's span, so nothing is dropped or evicted — the two
    // operators must emit identical feeds
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id").alias("key"),
        coalesce(col("event_type"), lit("")).alias("op_type"), col("ts"))
      .as[Ev].collect().sortBy(_.event_id)
      .map(e =>
        if (e.event_id % 3 == 0)
          e.copy(ts = e.ts - (e.event_id % 20 + 1) * 3600L * 1000000000L)
        else e)
    val timed = evs.map(e => TimedEv(e.event_id, e.key, e.op_type, e.ts,
      new java.sql.Timestamp(e.ts / 1000000L)))

    val in1 = MemoryStream[Ev]
    val q1 = observe(in1.toDS())
      .writeStream.format("memory").queryName("late_plain")
      .outputMode("append").start()
    val in2 = MemoryStream[TimedEv]
    val q2 = observeEventTime(in2.toDS(),
      keyTtlMs = 365L * 24 * 3600 * 1000, watermarkDelay = "720 hours")
      .writeStream.format("memory").queryName("late_timed")
      .outputMode("append").start()
    try {
      evs.grouped(evs.length / 4 + 1).zip(timed.grouped(timed.length / 4 + 1))
        .foreach { case (c1, c2) =>
          in1.addData(c1.toIndexedSeq: _*); q1.processAllAvailable()
          in2.addData(c2.toIndexedSeq: _*); q2.processAllAvailable()
        }
      val plain = spark.table("late_plain").as[Late].collect().toSet
      val withTtl = spark.table("late_timed").as[Late].collect().toSet
      assert(plain.nonEmpty && withTtl === plain)
    } finally { q1.stop(); q2.stop() }
  }

  test("event-time TTL evicts idle keys; re-anchored keys observe again") {
    // under RocksDB: the production (spillable-state) pin for the
    // event-time path, the sibling StreamingSemDedup discipline
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      def ev(id: Long, key: Long, ms: Long) =
        TimedEv(id, key, "u", ms * 1000000L, new java.sql.Timestamp(ms))
      val base = 3600L * 1000
      val in = MemoryStream[TimedEv]
      // 20 s delay: the watermark lags the max etime by 20 s, so an
      // event up to 20 s behind still reaches the operator (delay 0
      // would drop every cross-batch inversion before it ever got
      // here — the monitor would only see same-batch reorders); TTL
      // 10 s on top of each key's own max event time
      val q = observeEventTime(in.toDS(), keyTtlMs = 10000L,
        watermarkDelay = "20 seconds")
        .writeStream.format("memory").queryName("late_ttl")
        .outputMode("append").start()
      try {
        def stateRows: Long =
          q.lastProgress.stateOperators.apply(0).numRowsTotal
        // key 1 anchors at base, then inverts by 9s → late 9000 ms
        in.addData(ev(1L, 1L, base), ev(2L, 1L, base - 9000L))
        q.processAllAvailable()
        // key 2 advances the watermark past key 1's max + TTL...
        in.addData(ev(3L, 2L, base + 60000L)); q.processAllAvailable()
        // ...and key 1 (timed out, no data) is REMOVED in this batch —
        // pinned directly on the state-operator row count, because an
        // emission-based probe can't see it: any event the watermark
        // still admits is newer than the evicted anchor by construction
        in.addData(ev(4L, 2L, base + 61000L)); q.processAllAvailable()
        assert(stateRows === 1L, "idle key 1 must be evicted; key 2 lives")
        // key 1 returns above the watermark: re-anchors as a fresh key...
        in.addData(ev(5L, 1L, base + 70000L)); q.processAllAvailable()
        assert(stateRows === 2L, "the returned key re-anchors")
        // ...and a fresh inversion against the NEW anchor still emits
        in.addData(ev(6L, 1L, base + 65000L)); q.processAllAvailable()
        val got = spark.table("late_ttl").as[Late].collect().toSet
        assert(got === Set(Late(1L, "u", 2L, 9000L),
          Late(1L, "u", 6L, 5000L)),
          "one pre-eviction inversion, one post-re-anchor inversion")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("high-water and max event time survive a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("late_restart_ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Late]()
    val in = MemoryStream[Ev]
    def start() = observe(in.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Late], _: Long) =>
        b.collect().foreach(got.add)
      }
      .start()
    val q1 = start()
    try {
      in.addData(Ev(1L, 7L, "u", 9000000L)); q1.processAllAvailable()
    } finally q1.stop() // the kill
    assert(got.isEmpty)
    // restart from the checkpoint: the inversion below is only
    // visible if key 7's max event time crossed the restart
    val q2 = start()
    try {
      in.addData(Ev(2L, 7L, "u", 3000000L)); q2.processAllAvailable()
      assert(got.toArray.toSet === Set(Late(7L, "u", 2L, 6L)),
        "recovered state must observe the post-restart inversion")
    } finally q2.stop()
  }

  test("per-key max event time carries across micro-batches under RocksDB") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Ev]
      val q = observe(in.toDS())
        .writeStream.format("memory").queryName("late_rocks")
        .outputMode("append").start()
      try {
        in.addData(Ev(1L, 1L, "u", 9000000L)); q.processAllAvailable()
        // next batch: event time behind the FIRST batch's max → the
        // inversion is only visible if state crossed the batch boundary
        in.addData(Ev(2L, 1L, "u", 3000000L)); q.processAllAvailable()
        // an independent key sees no inversion from key 1's state
        in.addData(Ev(3L, 2L, "d", 1000000L)); q.processAllAvailable()
        assert(spark.table("late_rocks").as[Late].collect().toSet ===
          Set(Late(1L, "u", 2L, 6L)))
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
