package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeEventRow, Ns, ResumeToken}
import graft.sources.ChangeEventReplaySource

/** Delivery-guarantee parity, pinned as a test: the reference is
  * at-least-once into Kafka (`README.md:2` — a crash between produce
  * and token commit redelivers), and Spark's micro-batch replay gives
  * the same floor. `foreachBatch` + an idempotent keyed upsert
  * (apply only when the event's sequence exceeds the key's applied
  * high-water mark) upgrades that floor to EFFECTIVE exactly-once for
  * the cdc_apply materialization family: a replayed batch re-applies
  * as a no-op, so the downstream table after a crash-and-replay is
  * byte-identical to a run with no failure.
  *
  * The sink here crashes AFTER applying part of a batch (the worst
  * case: partial side effects land, then the batch replays whole),
  * and the spec asserts both that a duplicate delivery really
  * happened (at-least-once exercised, not vacuously) and that the
  * final table equals the batch cdc_apply recomputation.
  */
class ExactlyOnceSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private def ev(seq: Long, op: String, k: Long, cents: Long): ChangeEventRow = {
    val oid = f"$k%024x"
    val doc =
      if (op == "delete") None
      else Some(s"""{"_id": {"$$oid": "$oid"}, "k": $k, "cents": $cents}""")
    ChangeEventRow(
      ResumeToken(f"tok$seq%04d"), op,
      new Timestamp(seq), new Timestamp(seq),
      Ns("corpus", "documents"),
      Some(s"""{"_id": {"$$oid": "$oid"}, "k": $k}"""),
      doc, None, None)
  }

  // k=1 updated twice, k=2 deleted, k=3 inserted late; the crash fires
  // in the batch carrying seq 4-5
  private val fixture = Seq(
    ev(0L, "insert", 1L, 100L),
    ev(1L, "insert", 2L, 200L),
    ev(2L, "update", 1L, 150L),
    ev(3L, "delete", 2L, 0L),
    ev(4L, "insert", 3L, 300L), // the crash marker
    ev(5L, "update", 1L, 175L))

  test("idempotent upsert sink: crash-and-replay leaves the table " +
      "identical to a failure-free run (effective exactly-once)") {
    val opts = ChangeEventReplaySource.register("eos-fixture", fixture)
    val ckpt = java.nio.file.Files
      .createTempDirectory("eos_ckpt").toString
    // the downstream "table": key -> (applied high-water mark, live?, cents)
    val table = new ConcurrentHashMap[Long, (Long, Boolean, Long)]()
    val deliveries = new AtomicInteger(0) // every row delivery, dups included
    val crashed = new AtomicBoolean(false)

    def upsert(k: Long, seq: Long, op: String, cents: Long): Unit = {
      deliveries.incrementAndGet()
      table.compute(k, (_, cur) => {
        val hwm = if (cur == null) Long.MinValue else cur._1
        if (seq <= hwm) cur // replayed/stale delivery: no-op
        else if (op == "d") (seq, false, 0L)
        else (seq, true, cents)
      })
      ()
    }

    def build() = {
      val events = spark.readStream.format("graft-replay")
        .options(opts).option("maxRowsPerBatch", "2").load()
      import graft.cdc.EnvelopeTransform
      val changes = EnvelopeTransform.filterDataOps(events).select(
        get_json_object(col("documentKey"), "$.k").cast(LongType).alias("k"),
        unix_millis(col("clusterTime")).alias("seq"),
        EnvelopeTransform.opCode.alias("op"),
        coalesce(get_json_object(col("fullDocument"), "$.cents")
          .cast(LongType), lit(0L)).alias("cents"))
      changes.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().sortBy(_.getAs[Long]("seq"))
          rows.foreach { r =>
            val seq = r.getAs[Long]("seq")
            // crash mid-batch, AFTER this batch already applied its
            // earlier rows — partial side effects are now in `table`
            // and the whole batch will be redelivered
            upsert(r.getAs[Long]("k"), seq, r.getAs[String]("op"),
              r.getAs[Long]("cents"))
            if (seq == 4L && crashed.compareAndSet(false, true))
              throw new IllegalStateException("sink crashed mid-batch")
          }
        }
        .start()
    }

    val sup = new Supervisor(build,
      RestartPolicy(maxRestarts = 3, initialBackoffMs = 1L))
    @volatile var failure: Option[Throwable] = None
    val t = new Thread(() =>
      try sup.run() catch { case e: Throwable => failure = Some(e) })
    t.start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while ((table.size < 3 || table.get(1L) == null ||
          table.get(1L)._1 < 5L) && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally {
      sup.stop()
      t.join(30000)
      ChangeEventReplaySource.unregister("eos-fixture")
    }
    assert(failure.isEmpty, s"supervisor failed: $failure")
    assert(crashed.get, "the crash path never fired")
    assert(sup.restarts === 1)
    // at-least-once really happened: 6 events, but the crashed batch's
    // rows were delivered twice
    assert(deliveries.get > 6,
      s"no duplicate delivery observed (${deliveries.get}) — the replay " +
        "path was not exercised")
    // ...and the idempotent upsert absorbed it: final table equals the
    // batch cdc_apply recomputation (last-writer-wins, tombstones kept
    // as dead rows here so the delete is visible to the assertion)
    import scala.jdk.CollectionConverters._
    val live = table.asScala.toMap.collect {
      case (k, (seq, true, cents)) => k -> ((seq, cents))
    }
    assert(live === Map(1L -> ((5L, 175L)), 3L -> ((4L, 300L))),
      s"table diverged after replay: ${table.asScala.toMap}")
    assert(table.get(2L)._2 === false, "delete lost")
  }
}
