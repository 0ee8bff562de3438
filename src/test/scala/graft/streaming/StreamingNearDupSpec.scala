package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries.{As, Bs, K, P}
import graft.streaming.StreamingNearDup._

class StreamingNearDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away home"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog and runs far away now"
  private val unrelated =
    "completely different words about spark structured streaming state stores"

  test("signature: identical texts agree fully, near-dups mostly, unrelated rarely") {
    val a = signature(base).get
    val b = signature(nearDup).get
    val c = signature(unrelated).get
    def agree(x: Array[Long], y: Array[Long]) =
      x.zip(y).count { case (p, q) => p == q }
    assert(agree(a, a) === K)
    assert(agree(a, b) >= K / 2, s"near-dup agreement ${agree(a, b)}")
    assert(agree(a, c) < K / 4, s"unrelated agreement ${agree(a, c)}")
  }

  test("signature matches the batch MinHashSig aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, base)).toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), 3)).alias("sh"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("sh")), 1, 15), 16, 10)
          .cast("long"), lit(P)).alias("h"))
      .groupBy("doc_id")
      .agg(graft.functions.MinHashSig(col("h"), K, P, As, Bs).alias("sig"))
    val batchSig = df.head().getSeq[Long](1).toArray
    assert(batchSig.toSeq === signature(base).get.toSeq)
  }

  test("near-dups are found ACROSS micro-batches via bucket state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    // bucketTtl = None: with processing-time timeouts the engine
    // schedules timeout-check batches forever and processAllAvailable
    // never returns; the TTL path is unit-tested on matchBucket below
    val q = candidatePairs(in.toDS(), minAgree = 16, maxPerBucket = 8,
      bucketTtl = None)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, base), Doc(2L, unrelated))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() === 0)

      // the near-dup arrives two batches later — state must remember
      in.addData(Doc(3L, "filler text that matches nothing at all here"))
      q.processAllAvailable()
      in.addData(Doc(4L, nearDup))
      q.processAllAvailable()

      val pairs = spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(pairs.toSeq === Seq((1L, 4L)), s"got ${pairs.toSeq}")
    } finally q.stop()
  }

  test("a pair colliding in several bands emits once, from its minimum band") {
    // identical texts agree on all 32 rows → all 8 bands collide; only
    // band 0 (the minimum shared band) may emit the pair
    val sig = signature(base).get
    def run(band: Int): Seq[Pair] = {
      val rows = Seq(Banded(band, "k", 1L, sig), Banded(band, "k", 2L, sig))
      val state = new TestGroupState(List.empty[(Long, Array[Long])])
      matchBucket(minAgree = 1, maxPerBucket = 8, None)(
        (band, "k"), rows.iterator, state).toSeq
    }
    assert(run(0) === Seq(Pair(1L, 2L, K)))
    assert(run(3) === Seq.empty, "non-minimum band must suppress")
    assert(run(7) === Seq.empty)
  }

  test("streaming end-to-end: multi-band pair appears exactly once in the sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = candidatePairs(in.toDS(), minAgree = 16, maxPerBucket = 8,
      bucketTtl = None)
      .writeStream.format("memory").queryName("neardup_once")
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, base))
      q.processAllAvailable()
      in.addData(Doc(2L, base)) // identical: collides in all 8 bands
      q.processAllAvailable()
      val rows = spark.table("neardup_once").collect()
      assert(rows.length === 1, s"expected a single emission, got ${rows.length}")
      assert((rows.head.getLong(0), rows.head.getLong(1)) === ((1L, 2L)))
    } finally q.stop()
  }

  test("event-time TTL: timeout set from newest event + TTL, state dropped on fire") {
    val sig = signature(base).get
    val state = new TestGroupState[TimedBucket](null)
    val rows = Seq(
      TimedBanded(0, "k", 1L, sig, new java.sql.Timestamp(1000L)),
      TimedBanded(0, "k", 2L, sig, new java.sql.Timestamp(5000L)))
    val out = matchBucketEventTime(minAgree = 1, maxPerBucket = 8,
      bucketTtlMs = 60000L)((0, "k"), rows.iterator, state).toSeq
    assert(out === Seq(Pair(1L, 2L, K)))
    assert(state.timeoutTimestamps.lastOption === Some(65000L),
      "TTL must anchor on the newest event time in the bucket")
    // a LATE (within-watermark) arrival must NOT pull the deadline
    // earlier: the anchor is the bucket's max event time ever seen
    val late = Seq(TimedBanded(0, "k", 3L, unrelatedSig,
      new java.sql.Timestamp(1500L)))
    matchBucketEventTime(minAgree = 1, maxPerBucket = 8,
      bucketTtlMs = 60000L)((0, "k"), late.iterator, state).toSeq
    assert(state.timeoutTimestamps.lastOption === Some(65000L),
      "late arrival moved the TTL deadline earlier")
    // the watermark passing the deadline drops the bucket
    val timedOut = new TestGroupState(TimedBucket(List((1L, sig)), 1000L))
    timedOut.timedOut = true
    val after = matchBucketEventTime(minAgree = 1, maxPerBucket = 8,
      bucketTtlMs = 60000L)((0, "k"), Iterator.empty, timedOut).toSeq
    assert(after.isEmpty)
    assert(!timedOut.exists)
  }

  private lazy val unrelatedSig = signature(unrelated).get

  test("emitOncePerPair=false restores emit-in-every-shared-band (recall mode)") {
    val sig = signature(base).get
    val rows = Seq(Banded(3, "k", 1L, sig), Banded(3, "k", 2L, sig))
    val state = new TestGroupState(List.empty[(Long, Array[Long])])
    val out = matchBucket(minAgree = 1, maxPerBucket = 8, None,
      emitOncePerPair = false)((3, "k"), rows.iterator, state).toSeq
    assert(out === Seq(Pair(1L, 2L, K)),
      "recall mode must emit from a non-minimum band")
  }

  test("event-time variant end-to-end: pairs found; idle buckets evicted by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // offset from epoch 0: rows at/below the initial watermark (0)
    // are dropped as late by the stateful operator's late-data filter
    val t0 = 1000000L
    def t(ms: Long) = new java.sql.Timestamp(t0 + ms)
    val in = MemoryStream[TimedDoc]
    // TTL 1s, watermark delay 0: state older than 1s of EVENT time
    // evicts as the watermark advances — and unlike processing-time
    // timeouts, the engine schedules no perpetual timeout batches, so
    // processAllAvailable quiesces and the path is e2e-testable.
    val q = candidatePairsEventTime(in.toDS(), minAgree = 16,
      maxPerBucket = 8, bucketTtlMs = 1000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("neardup_et")
      .outputMode("append").start()
    try {
      in.addData(TimedDoc(1L, base, t(0L)))
      q.processAllAvailable()
      in.addData(TimedDoc(2L, nearDup, t(500L))) // inside TTL → pairs
      q.processAllAvailable()
      assert(spark.table("neardup_et").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
      // advance the watermark far past every bucket's deadline...
      in.addData(TimedDoc(3L, unrelated, t(100000L)))
      q.processAllAvailable()
      // ...let the timeout batch fire, then a fresh near-dup of doc 1
      // finds its buckets empty: no new pair
      in.addData(TimedDoc(4L, "mid stream filler text that matches nothing", t(100001L)))
      q.processAllAvailable()
      in.addData(TimedDoc(5L, base, t(100002L)))
      q.processAllAvailable()
      val pairs = spark.table("neardup_et").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs === Seq((1L, 2L)),
        s"evicted state must not pair with doc 5, got $pairs")
    } finally q.stop()
  }

  test("per-bucket state is FIFO-capped") {
    // fill one bucket past the cap with identical docs → state holds
    // at most maxPerBucket entries
    val sig = signature(base).get
    val rows = (1L to 5L).map(i => Banded(0, "k", i, sig))
    val state = new TestGroupState(List.empty[(Long, Array[Long])])
    val out = matchBucket(minAgree = K, maxPerBucket = 3, Some("1 hour"))(
      (0, "k"), rows.iterator, state).toSeq
    assert(state.value.length === 3)
    // newest retained first (FIFO eviction of the oldest)
    assert(state.value.map(_._1) === List(5L, 4L, 3L))
    // each arrival matched everything retained at that moment
    assert(out.nonEmpty)
  }

  test("idle-bucket timeout drops the bucket's state (TTL eviction)") {
    val sig = signature(base).get
    val state = new TestGroupState(List((1L, sig)))
    state.timedOut = true
    val out = matchBucket(minAgree = 1, maxPerBucket = 8, Some("1 hour"))(
      (0, "k"), Iterator.empty, state).toSeq
    assert(out.isEmpty)
    assert(!state.exists, "state must be removed on timeout")
  }
}

/** Minimal GroupState for driving matchBucket directly. */
final class TestGroupState[T](init: T)
    extends org.apache.spark.sql.streaming.GroupState[T] {
  private var v: Option[T] = Option(init)
  var timedOut: Boolean = false
  val timeoutTimestamps = scala.collection.mutable.ArrayBuffer.empty[Long]
  def value: T = v.get
  override def exists: Boolean = v.isDefined
  override def get: T = v.get
  override def getOption: Option[T] = v
  override def update(newValue: T): Unit = v = Some(newValue)
  override def remove(): Unit = v = None
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit =
    timeoutTimestamps += timestampMs
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
