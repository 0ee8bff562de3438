package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSnapshot._

class StreamingSnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  /** Latest emitted row per key (the documented consumption contract),
    * restricted to live rows.
    */
  private def liveView(table: String): Map[Long, SnapRow] = {
    import spark.implicits._
    spark.table(table).as[SnapRow].collect()
      .groupBy(_.key)
      .map { case (k, rows) => k -> rows.maxBy(_.lastEventId) }
      .filter(_._2.live)
  }

  test("snapshot equals batch cdc_apply-style max_by over the same changes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 50 keys × several generations, deletes sprinkled in; delivered
    // across three batches with intra-batch disorder
    val changes = for {
      k <- 0L until 50L
      gen <- 0L until 4L
    } yield {
      val id = gen * 100 + k
      val op = if (k % 7 == 0 && gen == 3) "d" else if (gen == 0) "c" else "u"
      Change(k, id, op, s"doc-$k-$gen", k * 10 + gen)
    }
    val shuffled = new scala.util.Random(42).shuffle(changes)
    val (b1, rest) = shuffled.splitAt(70)
    val (b2, b3) = rest.splitAt(70)

    val in = MemoryStream[Change]
    val q = StreamingSnapshot(in.toDS())
      .writeStream.format("memory").queryName("snap_eq")
      .outputMode("update").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
      val got = liveView("snap_eq")

      val expect = changes.toDF()
        .groupBy("key")
        .agg(max_by(struct(col("eventId"), col("op"), col("doc"),
          col("cents")), col("eventId")).alias("s"))
        .select(col("key"), col("s.eventId"), col("s.op"), col("s.doc"),
          col("s.cents"))
        .filter(col("op") =!= "d")
        .as[(Long, Long, String, String, Long)].collect()
        .map { case (k, id, op, doc, c) => k -> ((id, op, doc, c)) }.toMap

      assert(got.keySet === expect.keySet)
      got.foreach { case (k, r) =>
        val (id, op, doc, c) = expect(k)
        assert((r.lastEventId, r.op, r.doc, r.cents) === ((id, op, doc, c)),
          s"key $k diverged from the batch snapshot")
      }
    } finally q.stop()
  }

  test("redelivery of applied sequence numbers is a no-op (at-least-once)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    val q = StreamingSnapshot(in.toDS())
      .writeStream.format("memory").queryName("snap_replay")
      .outputMode("update").start()
    try {
      val batch = Seq(
        Change(1L, 10L, "c", "a", 1L),
        Change(2L, 11L, "c", "b", 2L))
      in.addData(batch: _*); q.processAllAvailable()
      val before = spark.table("snap_replay").count()
      // resume-token replay: the exact same events arrive again
      in.addData(batch: _*); q.processAllAvailable()
      assert(spark.table("snap_replay").count() === before,
        "replayed events must emit nothing")
      // and a stale UPDATE below the high-water mark is also ignored
      in.addData(Change(1L, 5L, "u", "stale", 99L)); q.processAllAvailable()
      assert(spark.table("snap_replay").count() === before)
      assert(liveView("snap_replay")(1L).doc === "a")
    } finally q.stop()
  }

  test("tombstone deletes the key's state; the documented GC trade holds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    val q = StreamingSnapshot(in.toDS())
      .writeStream.format("memory").queryName("snap_del")
      .outputMode("update").start()
    try {
      in.addData(Change(7L, 100L, "c", "x", 1L)); q.processAllAvailable()
      in.addData(Change(7L, 200L, "d", "", 0L)); q.processAllAvailable()
      assert(!liveView("snap_del").contains(7L))
      val tomb = spark.table("snap_del").as[SnapRow].collect()
        .filter(r => r.key == 7L && !r.live)
      assert(tomb.map(_.lastEventId).max === 200L)

      // state was REMOVED (bounded state = live keys), so an event
      // older than the delete arriving in a later batch resurrects
      // the key — the documented no-tombstone-memory trade; a same-
      // batch stale event cannot (in-batch sequence order applies).
      // Asserted on the emitted row itself: the max-sequence view
      // (liveView) rightly still shows the delete as newest.
      in.addData(Change(7L, 150L, "u", "zombie", 2L)); q.processAllAvailable()
      val rows = spark.table("snap_del").as[SnapRow].collect()
        .filter(_.key == 7L)
      assert(rows.exists(r => r.live && r.doc == "zombie" &&
        r.lastEventId == 150L), s"resurrect row missing: ${rows.toSeq}")
    } finally q.stop()
  }
}
