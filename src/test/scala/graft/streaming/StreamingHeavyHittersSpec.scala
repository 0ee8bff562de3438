package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingHeavyHitters._

class StreamingHeavyHittersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  test("mgUpdate: increment, claim, and decrement-all behaviors") {
    var c = Map.empty[String, Long]
    c = mgUpdate(c, "a", 2) // claim
    c = mgUpdate(c, "a", 2) // increment
    c = mgUpdate(c, "b", 2) // claim (slot free)
    assert(c === Map("a" -> 2L, "b" -> 1L))
    // full summary + untracked term: everything decrements, zeroed
    // counters drop
    c = mgUpdate(c, "z", 2)
    assert(c === Map("a" -> 1L))
  }

  test("mgUpdate guarantee: heavy element survives any adversarial stream") {
    // 40 arrivals, capacity 3 → any term with > 10 true occurrences
    // must be retained with est >= true - n/(cap+1)
    val stream = Seq.fill(15)("hot") ++
      (0 until 25).map(i => s"cold${i % 12}")
    val interleaved = stream.zipWithIndex
      .sortBy { case (_, i) => (i * 7919) % 40 }.map(_._1)
    val counts = interleaved.foldLeft(Map.empty[String, Long])(
      (m, t) => mgUpdate(m, t, 3))
    val n = interleaved.size
    assert(counts.contains("hot"), s"heavy element evicted: $counts")
    assert(counts("hot") >= 15L - n / 4, s"estimate too low: $counts")
    assert(counts("hot") <= 15L, "Misra-Gries never overcounts")
    assert(counts.size <= 3, "summary exceeded capacity")
  }

  test("heavy hitters surface across micro-batches with bounded summaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Term]
    // idleTtl = None: processing-time timeouts keep scheduling
    // timeout-check batches, so processAllAvailable would never
    // quiesce (same note as StreamingNearDupSpec)
    val q = summaries(in.toDS(), buckets = 4, capacity = 4, idleTtl = None)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("append").start()
    try {
      in.addData((1 to 10).map(_ => Term("popular")) ++
        Seq(Term("x1"), Term("x2")): _*)
      q.processAllAvailable()
      in.addData((1 to 10).map(_ => Term("popular")) ++
        Seq(Term("y1"), Term("y2")): _*)
      q.processAllAvailable()
      val rows = spark.table("hh_out")
        .as[Hitter].collect()
      // counts accumulate across batches through bucket state
      val popular = rows.filter(_.term == "popular")
      assert(popular.nonEmpty)
      assert(popular.map(_.est).max === 20L,
        s"state did not carry across batches: ${popular.toSeq}")
      // every emitted summary respects the capacity bound
      val latestPerBucketTerm = rows.groupBy(_.bucket)
      latestPerBucketTerm.foreach { case (b, rs) =>
        val distinctTerms = rs.map(_.term).toSet
        // across ALL batches a bucket may emit more distinct terms
        // than capacity (evictions), but no single batch's summary may
        // exceed it: group by n (the per-batch arrival stamp)
        rs.groupBy(_.n).foreach { case (_, batchRows) =>
          assert(batchRows.length <= 4,
            s"bucket $b summary exceeded capacity: ${batchRows.toSeq}")
        }
        assert(distinctTerms.nonEmpty)
      }
      // the documented consumption contract: latest-row-wins, selected
      // by max n per (bucket, term) — earlier rows are superseded
      // snapshots, and the latest estimate equals the true total here
      val latest = rows.groupBy(r => (r.bucket, r.term))
        .map { case (_, rs) => rs.maxBy(_.n) }
      assert(latest.find(_.term == "popular").map(_.est) === Some(20L),
        "latest-row-wins selection did not yield the accumulated count")
    } finally q.stop()
  }

  test("bucket routing is deterministic and spreads terms") {
    val terms = (0 until 100).map(i => s"term$i")
    val assignments = terms.map(t => bucketOf(t, 16))
    assert(assignments === terms.map(t => bucketOf(t, 16)), "not stable")
    assert(assignments.toSet.size > 8, "routing collapsed onto few buckets")
    assert(assignments.forall(b => b >= 0 && b < 16))
  }
}
