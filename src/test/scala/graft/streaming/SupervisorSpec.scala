package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ChangeEvents
import graft.sources.ChangeEventReplaySource

/** The invalidate restart policy (SURVEY §7.3 hard part 3): the
  * reference's reader exits when the cursor is invalidated and the
  * supervisor restarts it from the saved token (`watch.py:86-91`,
  * `manager.py:225-230`). Here: a replay-source stream whose sink
  * dies on the invalidate event; the Supervisor restarts the query
  * from its checkpoint and the killed micro-batch replays — every
  * data event before AND after the invalidate is delivered, none
  * lost.
  */
class SupervisorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  // invalidate in the middle of the stream so events exist on both
  // sides of the forced restart
  private def fixture = {
    val g = ChangeEvents.goldenEvents
    Seq(g(0), g(1), g(6), g(2), g(3)) // insert, update, INVALIDATE, replace, delete
  }

  private def token(r: org.apache.spark.sql.Row): String =
    r.getAs[org.apache.spark.sql.Row]("_id").getString(0)

  test("invalidate kills the query; restart from checkpoint loses no events") {
    val opts = ChangeEventReplaySource.register("supervisor-fixture", fixture)
    val ckpt = java.nio.file.Files
      .createTempDirectory("supervisor_ckpt").toString
    val seen = ConcurrentHashMap.newKeySet[String]()
    val died = new AtomicBoolean(false)

    def build() = {
      val events = spark.readStream.format("graft-replay")
        .options(opts).option("maxRowsPerBatch", "3").load()
      events.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect()
          // the cursor-death analog: first sight of invalidate kills
          // the query BEFORE anything in the batch is delivered
          if (rows.exists(_.getAs[String]("operationType") == "invalidate")
              && died.compareAndSet(false, true))
            throw new IllegalStateException("cursor invalidated")
          rows.filter(r => ChangeEvents.DataOps
              .contains(r.getAs[String]("operationType")))
            .foreach(r => seen.add(token(r)): Unit)
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
      while (seen.size < 4 && System.nanoTime() < deadline) Thread.sleep(50)
    } finally {
      sup.stop()
      t.join(30000)
    }
    assert(failure.isEmpty, s"supervisor failed: $failure")
    assert(sup.restarts === 1)
    // all 4 data events delivered — the batch killed by the invalidate
    // (insert, update rode in it) replayed after restart
    assert(seen.size === 4)
    val expected = Set(ChangeEvents.tokenInsert, ChangeEvents.tokenUpdate,
      ChangeEvents.tokenReplace, ChangeEvents.tokenDelete)
    assert(scala.jdk.CollectionConverters.SetHasAsScala(seen).asScala.toSet
      === expected)
  }

  test("a persistently-failing query exhausts the budget with exponential backoff") {
    val opts = ChangeEventReplaySource.register("supervisor-fixture-2", fixture)
    val ckpt = java.nio.file.Files
      .createTempDirectory("supervisor_ckpt2").toString
    def build() = {
      val events = spark.readStream.format("graft-replay")
        .options(opts).option("maxRowsPerBatch", "3").load()
      events.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new IllegalStateException("always down")
        }
        .start()
    }
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sup = new Supervisor(build,
      RestartPolicy(maxRestarts = 2, initialBackoffMs = 1L),
      sleep = ms => sleeps.synchronized { sleeps += ms })
    intercept[StreamingQueryException](sup.run())
    assert(sup.restarts === 2)
    assert(sleeps.toSeq === Seq(1L, 2L)) // doubling, bounded budget
  }
}
