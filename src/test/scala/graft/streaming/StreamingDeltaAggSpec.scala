package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDeltaAgg._

/** Pins the streaming incremental-view-maintenance twin of the batch
  * `cdc_delta_agg` query: per-bucket (count, sum) of the live snapshot
  * maintained from change events, with at-least-once redelivery
  * emitting zero deltas.
  */
class StreamingDeltaAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  /** Latest emitted row per bucket — the documented Update-mode
    * consumption contract (the memory sink accumulates history).
    */
  private def view(table: String): Map[Long, (Long, Long)] = {
    // the memory sink appends each update in arrival order, so the
    // last row per bucket is the current running total
    spark.table(table).collect().zipWithIndex
      .groupBy(_._1.getLong(0))
      .map { case (b, rows) =>
        val r = rows.maxBy(_._2)._1
        b -> ((r.getLong(1), r.getLong(2)))
      }
      .filter { case (_, (n, _)) => n > 0 }
  }

  /** Batch recomputation from scratch: last-writer-wins per key,
    * tombstones dropped, grouped into buckets — what the maintained
    * view must equal after any prefix of the stream.
    */
  private def recompute(changes: Seq[Change]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    changes.toDF()
      .groupBy("key")
      .agg(max_by(col("op"), col("eventId")).alias("op"),
        max_by(col("cents"), col("eventId")).alias("cents"))
      .filter(col("op") =!= "d")
      .groupBy((col("key") % 16).alias("bucket"))
      .agg(count(lit(1)).alias("n"), sum(col("cents")).alias("c"))
      .as[(Long, Long, Long)].collect()
      .map { case (b, n, c) => b -> ((n, c)) }.toMap
  }

  test("maintained view equals batch recomputation after ordered replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 60 keys × 4 generations with deletes, re-inserts after delete,
    // and value-neutral updates; delivered in sequence order across
    // three micro-batches (ordered replay — the reference's delivery
    // order after a resume)
    val changes = for {
      gen <- 0L until 4L
      k <- 0L until 60L
    } yield {
      val id = gen * 100 + k
      val op =
        if (k % 7 == 0 && gen == 2) "d"
        else if (k % 7 == 0 && gen == 3) "c" // re-insert after delete
        else if (gen == 0) "c"
        else "u"
      // k % 5 == 1, gen 2: rewrite the same value (must emit no delta)
      val cents = if (k % 5 == 1 && gen == 2) k * 10 + 1 else k * 10 + gen
      Change(k, id, op, cents)
    }
    val batches = changes.grouped(80).toSeq
    val in = MemoryStream[Change]
    val q = StreamingDeltaAgg(in.toDS())
      .writeStream.format("memory").queryName("ivm_eq")
      .outputMode("update").start()
    try {
      var seen = Vector.empty[Change]
      for (b <- batches) {
        in.addData(b: _*); q.processAllAvailable()
        seen ++= b
        // the view must equal the from-scratch recomputation after
        // EVERY prefix, not just at the end — that is what "maintained"
        // means
        assert(view("ivm_eq") === recompute(seen),
          s"diverged after ${seen.size} events")
      }
    } finally q.stop()
  }

  test("redelivered batches and stale events emit no deltas (at-least-once)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    val q = StreamingDeltaAgg(in.toDS())
      .writeStream.format("memory").queryName("ivm_replay")
      .outputMode("update").start()
    try {
      val batch = Seq(
        Change(1L, 10L, "c", 100L),
        Change(2L, 11L, "c", 200L),
        Change(17L, 12L, "c", 300L)) // 17 % 16 == 1: shares bucket 1
      in.addData(batch: _*); q.processAllAvailable()
      val rows = spark.table("ivm_replay").count()
      assert(view("ivm_replay") === Map(1L -> ((2L, 400L)), 2L -> ((1L, 200L))))
      // resume-token replay: the exact same events arrive again — a
      // non-idempotent delta path would double the sums here
      in.addData(batch: _*); q.processAllAvailable()
      assert(spark.table("ivm_replay").count() === rows,
        "replayed events must emit nothing")
      assert(view("ivm_replay") === Map(1L -> ((2L, 400L)), 2L -> ((1L, 200L))))
      // stale update below the high-water mark: also nothing
      in.addData(Change(1L, 5L, "u", 999L)); q.processAllAvailable()
      assert(view("ivm_replay") === Map(1L -> ((2L, 400L)), 2L -> ((1L, 200L))))
    } finally q.stop()
  }

  test("tombstone state is retained, so post-delete redelivery stays exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    val q = StreamingDeltaAgg(in.toDS())
      .writeStream.format("memory").queryName("ivm_tomb")
      .outputMode("update").start()
    try {
      in.addData(Change(3L, 10L, "c", 50L)); q.processAllAvailable()
      in.addData(Change(3L, 20L, "d", 0L)); q.processAllAvailable()
      assert(view("ivm_tomb") === Map.empty)
      // an event OLDER than the processed delete arrives in a later
      // batch (the redelivery scenario StreamingSnapshot documents as
      // its resurrect trade): the retained high-water mark must
      // swallow it — the aggregate cannot afford a phantom +1
      in.addData(Change(3L, 15L, "u", 75L)); q.processAllAvailable()
      assert(view("ivm_tomb") === Map.empty,
        "pre-delete redelivery resurrected a deleted key's contribution")
    } finally q.stop()
  }

  test("delta algebra holds under the RocksDB state store provider") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Change]
      val q = StreamingDeltaAgg(in.toDS())
        .writeStream.format("memory").queryName("ivm_rocks")
        .outputMode("update").start()
      try {
        // each transition in its own batch: every high-water mark and
        // running total must round-trip through RocksDB-backed state
        in.addData(Change(1L, 10L, "c", 100L)); q.processAllAvailable()
        in.addData(Change(1L, 20L, "u", 150L)); q.processAllAvailable()
        in.addData(Change(1L, 10L, "c", 100L)); q.processAllAvailable() // replay
        in.addData(Change(1L, 30L, "d", 0L)); q.processAllAvailable()
        in.addData(Change(2L, 40L, "c", 70L)); q.processAllAvailable()
        assert(view("ivm_rocks") === Map(2L -> ((1L, 70L))),
          "delta state diverged under RocksDB")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
