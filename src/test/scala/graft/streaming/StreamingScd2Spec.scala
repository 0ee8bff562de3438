package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingScd2._

/** Pins the streaming SCD2 twin against the batch `cdc_scd2` shape:
  * closed intervals from the stream must equal the batch history's
  * closed rows after ordered replay, the final open state is exactly
  * the batch's NULL-valid_to rows (counted via the closed/total
  * algebra), redelivery emits nothing, and the fold survives RocksDB.
  */
class StreamingScd2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private def closedRows(table: String): Set[(Long, Long, String, Long, Long)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet

  /** The batch cdc_scd2 window build over the same events. */
  private def batchHistory(changes: Seq[Change])
      : (Set[(Long, Long, String, Long, Long)], Long) = {
    import spark.implicits._
    val hist = changes.toDF()
      .select(col("key"), col("eventId").alias("valid_from"),
        col("op"), col("cents"))
      .withColumn("valid_to", lead(col("valid_from"), 1)
        .over(Window.partitionBy("key").orderBy("valid_from")))
    val closed = hist.filter(col("valid_to").isNotNull).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet
    val openCount = hist.filter(col("valid_to").isNull).count()
    (closed, openCount)
  }

  test("closed intervals equal the batch history after ordered replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 40 keys × 4 generations incl. deletes and post-delete re-inserts
    val changes = for {
      gen <- 0L until 4L
      k <- 0L until 40L
      if gen != 3L || k % 3L == 0L // ragged: not every key has 4 events
    } yield {
      val op =
        if (k % 5 == 0 && gen == 2) "d"
        else if (gen == 0) "c"
        else "u"
      Change(k, gen * 1000 + k, op, k * 10 + gen)
    }
    val in = MemoryStream[Change]
    val q = StreamingScd2(in.toDS())
      .writeStream.format("memory").queryName("scd2_eq")
      .outputMode("append").start()
    try {
      var seen = Vector.empty[Change]
      for (b <- changes.grouped(55).toSeq) {
        in.addData(b: _*); q.processAllAvailable()
        seen ++= b
        val (wantClosed, wantOpen) = batchHistory(seen)
        assert(closedRows("scd2_eq") === wantClosed,
          s"closed-history divergence after ${seen.size} events")
        // every key's latest version stays open in state: total batch
        // rows = closed + open, so the open count is pinned by algebra
        assert(seen.size - wantClosed.size === wantOpen)
      }
    } finally q.stop()
  }

  test("redelivered and stale events close nothing (at-least-once)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    val q = StreamingScd2(in.toDS())
      .writeStream.format("memory").queryName("scd2_replay")
      .outputMode("append").start()
    try {
      val batch = Seq(Change(7L, 10L, "c", 100L), Change(7L, 20L, "u", 150L))
      in.addData(batch: _*); q.processAllAvailable()
      assert(closedRows("scd2_replay") ===
        Set((7L, 10L, "c", 100L, 20L)))
      // resume-token replay of the identical batch: a non-idempotent
      // fold would close the open v20 against the redelivered v20 or
      // re-emit the first interval
      in.addData(batch: _*); q.processAllAvailable()
      assert(spark.table("scd2_replay").count() === 1L,
        "replay must append nothing")
      // stale event below the open version's high-water mark
      in.addData(Change(7L, 15L, "u", 999L)); q.processAllAvailable()
      assert(spark.table("scd2_replay").count() === 1L,
        "a stale event must not rewrite history")
      // genuinely new event closes exactly the open v20
      in.addData(Change(7L, 30L, "d", 0L)); q.processAllAvailable()
      assert(closedRows("scd2_replay") ===
        Set((7L, 10L, "c", 100L, 20L), (7L, 20L, "u", 150L, 30L)))
    } finally q.stop()
  }

  test("interval chaining survives the RocksDB state store provider") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Change]
      val q = StreamingScd2(in.toDS())
        .writeStream.format("memory").queryName("scd2_rocks")
        .outputMode("append").start()
      try {
        // one transition per micro-batch: every open row must
        // round-trip through RocksDB-backed state to chain correctly
        in.addData(Change(1L, 10L, "c", 100L)); q.processAllAvailable()
        in.addData(Change(1L, 20L, "u", 150L)); q.processAllAvailable()
        in.addData(Change(1L, 10L, "c", 100L)); q.processAllAvailable()
        in.addData(Change(1L, 30L, "d", 0L)); q.processAllAvailable()
        assert(closedRows("scd2_rocks") === Set(
          (1L, 10L, "c", 100L, 20L),
          (1L, 20L, "u", 150L, 30L)),
          "interval chain diverged under RocksDB")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
