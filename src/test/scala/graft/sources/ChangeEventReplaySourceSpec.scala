package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeEvents, EnvelopeTransform, Ns}

/** The replay MicroBatchStream against the reference reader's
  * contract: deployment-wide scope (S2), batch-size pacing (S3/S5),
  * and offsets that advance on heartbeat-only events (S6/P5).
  */
class ChangeEventReplaySourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  // Two namespaces (the connector can only watch one collection; the
  // reference watches the whole deployment) + the 3 heartbeat ops at
  // the tail.
  private def fixture = {
    val ns2 = Ns("other-db", "OtherCollection")
    val dataOps = ChangeEvents.goldenEvents.take(4)
    dataOps ++ dataOps.map(e => e.copy(ns = ns2)) ++
      ChangeEvents.goldenEvents.drop(4) // drop, dropDatabase, invalidate
  }

  test("deployment-wide replay: paced batches, all namespaces, heartbeat offsets") {
    val opts = ChangeEventReplaySource.register("spec-fixture", fixture)
    val events = spark.readStream.format("graft-replay")
      .options(opts)
      .option("maxRowsPerBatch", "3")
      .load()
    val out = EnvelopeTransform(events, topicPrefix = "test")
    val q = out.writeStream
      .format("memory").queryName("replay_out")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("replay_out").collect()
      // 8 data events survive the F1 filter (4 per namespace)...
      assert(rows.length === 8)
      // ...and route to both namespaces (S2: one stream, many ns)
      val topics = rows.map(_.getString(0)).distinct.sorted
      assert(topics === Array(
        "test.other-db.OtherCollection", "test.test-database.TestCollection"))
      // pacing: no micro-batch admitted more than 3 source rows
      val progressed = q.recentProgress.filter(_.numInputRows > 0)
      assert(progressed.forall(_.numInputRows <= 3),
        progressed.map(_.numInputRows).mkString(","))
      // S6/P5 parity: the committed offset covers ALL 11 events —
      // the trailing heartbeat-only batch (drop/dropDatabase/
      // invalidate → zero output rows) still advanced the sequence.
      val end = q.lastProgress.sources.head.endOffset
      assert(end === "11", s"endOffset=$end")
    } finally q.stop()
  }

  test("restart from checkpoint resumes, not replays (C5 parity)") {
    val opts = ChangeEventReplaySource.register("spec-fixture-2", fixture)
    val ckpt = java.nio.file.Files
      .createTempDirectory("replay_ckpt").toString
    // memory sink can't recover a checkpoint; collect via foreachBatch
    def run(): Long = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0L)
      val events = spark.readStream.format("graft-replay")
        .options(opts).option("maxRowsPerBatch", "4").load()
      val q = EnvelopeTransform(events, "test").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            seen.addAndGet(b.count()): Unit
        }
        .start()
      try { q.processAllAvailable(); seen.get() } finally q.stop()
    }
    assert(run() === 8L)
    // second run with the same checkpoint: everything already
    // committed, nothing re-emitted
    assert(run() === 0L)
  }
}
