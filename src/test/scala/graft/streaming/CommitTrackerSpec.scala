package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import CommitTracker._

/** State-machine parity with the reference commit tracker
  * (`committing/commit_processing.py`, exercised by
  * `tests/test_commit_flow/test_process_commit_event.py` and the E2E
  * smoke `tests/test_change_stream_reading/test_application.py`).
  */
class CommitTrackerSpec extends AnyFunSuite {

  private def in(count: Long, needConfirm: Boolean, tok: String = null) =
    CommitInput("r", count, needConfirm, Option(tok))

  private def run(evs: CommitInput*): (TrackerState, Seq[Committable]) = {
    val (st, out) = drain(emptyState, evs.iterator, "r")
    (st, out.toSeq)
  }

  test("in-order confirmed events commit with the latest token") {
    val (st, out) = run(in(1, false, "t1"), in(2, false, "t2"))
    assert(out === Seq(Committable("r", 1, 2, "t2")))
    assert(st.lastCommitted === 2 && st.confirmed.isEmpty)
  }

  test("unconfirmed events block the prefix until confirmed") {
    val (st1, out1) = run(in(1, true, "t1"), in(2, false, "t2"))
    assert(out1.isEmpty, "in-flight count 1 must block")
    // producer delivery confirm carries no token; token came on the
    // unconfirmed event (reference K5 shape)
    val (st2, out2) = drain(st1, Iterator(in(1, false)), "r")
    assert(out2.toSeq === Seq(Committable("r", 1, 2, "t2")))
    assert(st2.lastCommitted === 2)
  }

  test("tokenless confirmed tail waits; next token commits through it") {
    val (st1, out1) = run(in(1, false, "t1"), in(2, false))
    assert(out1 === Seq(Committable("r", 1, 1, "t1")))
    assert(st1.confirmed.contains(2L), "tokenless 2 stays pending")
    val (st2, out2) = drain(st1, Iterator(in(3, false, "t3")), "r")
    assert(out2.toSeq === Seq(Committable("r", 2, 3, "t3")))
    assert(st2.confirmed.isEmpty)
  }

  test("duplicate and stale events merge tokens, never regress") {
    val (st1, _) = run(in(1, true, "a"), in(1, true))
    assert(st1.unconfirmed(1L) === Some("a"), "empty token must not clobber")
    val (st2, out2) = drain(st1, Iterator(in(1, false)), "r")
    assert(out2.toSeq === Seq(Committable("r", 1, 1, "a")))
    // stale events at/below the watermark are dropped
    val (st3, out3) = drain(st2, Iterator(in(1, false, "zzz"), in(1, true)), "r")
    assert(out3.isEmpty && st3 === st2)
  }

  test("needConfirm for an already-confirmed count is ignored") {
    val (st, _) = run(in(2, false, "t2"))
    val (st2, _) = drain(st, Iterator(in(2, true, "x")), "r")
    assert(st2.unconfirmed.isEmpty)
    assert(st2.confirmed(2L) === Some("t2"))
  }

  test("golden-event flow: 4 in-flight + 3 heartbeats, then confirms") {
    // counts 1-4 = data events (need confirm, tokens attached);
    // 5-7 = drop/dropDatabase/invalidate (directly confirmed)
    val wave1 = (1L to 4L).map(c => in(c, true, s"t$c")) ++
      (5L to 7L).map(c => in(c, false, s"t$c"))
    val (st1, out1) = run(wave1: _*)
    assert(out1.isEmpty, "nothing commits while 1-4 are in flight")
    assert(st1.unconfirmed.size === 4 && st1.confirmed.size === 3)

    // first two deliveries → commit through 2 (reference
    // test_application.py: token equals the last confirmed event's)
    val (st2, out2) = drain(st1, Iterator(in(1, false), in(2, false)), "r")
    assert(out2.toSeq === Seq(Committable("r", 1, 2, "t2")))

    // remaining deliveries → commit through 7 with event 7's token
    val (st3, out3) = drain(st2, Iterator(in(3, false), in(4, false)), "r")
    assert(out3.toSeq === Seq(Committable("r", 3, 7, "t7")))
    assert(st3.lastCommitted === 7 &&
      st3.confirmed.isEmpty && st3.unconfirmed.isEmpty)
  }

  test("streaming: per-reader state across micro-batches") {
    val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CommitInput]
    val q = CommitTracker.trackStream(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("commits").start()
    try {
      input.addData(
        CommitInput("a", 1, true, Some("a1")),
        CommitInput("a", 2, false, Some("a2")),
        CommitInput("b", 1, false, Some("b1")))
      q.processAllAvailable()
      input.addData(CommitInput("a", 1, false, None))
      q.processAllAvailable()
      val rows = spark.table("commits").as[Committable].collect().toSet
      assert(rows === Set(
        Committable("b", 1, 1, "b1"),
        Committable("a", 1, 2, "a2")))
    } finally q.stop()
  }
}
