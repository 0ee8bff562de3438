package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAnomaly.{detect, Anomaly, Obs}
import graft.streaming.StreamingNearDup.{candidatePairs, Doc}
import graft.streaming.StreamingHeavyHitters.{summaries, Hitter, Term}
import graft.streaming.StreamingSnapshot.{Change, SnapRow}

/** The stateful streaming operators under the RocksDB state store
  * provider — the 100-TB configuration, where keyed state spills to
  * local disk instead of living in executor heap (the default
  * HDFS-backed provider keeps every version in memory). The operators
  * only touch state through the GroupState API, so behavior must be
  * byte-identical; this spec pins that the bounded-state contracts
  * (cross-batch near-dup matching, Misra-Gries summaries) hold with
  * spillable state, i.e. nothing in them depends on the memory-backed
  * default (VERDICT r4 next-round item 8).
  */
class RocksDbStateStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[A](f: => A): A = {
    val prior = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try f
    finally prior match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away home"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog and runs far away now"
  private val unrelated =
    "completely different words about spark structured streaming state stores"

  test("near-dup bucket state carries across micro-batches under RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Doc]
      val q = candidatePairs(in.toDS(), minAgree = 16, maxPerBucket = 8,
        bucketTtl = None)
        .writeStream.format("memory").queryName("rocks_neardup")
        .outputMode("append").start()
      try {
        assert(spark.conf.get(ProviderKey) === RocksDb)
        in.addData(Doc(1L, base), Doc(2L, unrelated))
        q.processAllAvailable()
        assert(spark.table("rocks_neardup").count() === 0)
        in.addData(Doc(4L, nearDup))
        q.processAllAvailable()
        val pairs = spark.table("rocks_neardup").collect()
          .map(r => (r.getLong(0), r.getLong(1))).distinct
        assert(pairs.toSeq === Seq((1L, 4L)), s"got ${pairs.toSeq}")
      } finally q.stop()
    }
  }

  test("event-time near-dup TTL pairs and evicts under RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.StreamingNearDup.{candidatePairsEventTime, TimedDoc}
      // same sign-controlled shape as StreamingNearDupSpec's
      // event-time e2e test, but with the TimedBucket state (held
      // entries + maxTs anchor) living in RocksDB: pairs inside the
      // TTL must emit, watermark-evicted buckets must stay gone
      val t0 = 1000000L
      def t(ms: Long) = new java.sql.Timestamp(t0 + ms)
      val in = MemoryStream[TimedDoc]
      val q = candidatePairsEventTime(in.toDS(), minAgree = 16,
        maxPerBucket = 8, bucketTtlMs = 1000L,
        watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName("rocks_neardup_et")
        .outputMode("append").start()
      try {
        assert(spark.conf.get(ProviderKey) === RocksDb)
        in.addData(TimedDoc(1L, base, t(0L)))
        q.processAllAvailable()
        in.addData(TimedDoc(2L, nearDup, t(500L))) // inside TTL → pair
        q.processAllAvailable()
        assert(spark.table("rocks_neardup_et").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
        // advance the watermark far past every bucket's deadline,
        // let the timeout batch fire, then a fresh near-dup of doc 1
        // must find its buckets empty (evicted IN RocksDB state)
        in.addData(TimedDoc(3L, unrelated, t(100000L)))
        q.processAllAvailable()
        in.addData(TimedDoc(4L,
          "mid stream filler text that matches nothing", t(100001L)))
        q.processAllAvailable()
        in.addData(TimedDoc(5L, base, t(100002L)))
        q.processAllAvailable()
        val pairs = spark.table("rocks_neardup_et").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(pairs === Seq((1L, 2L)),
          s"evicted RocksDB state must not pair with doc 5, got $pairs")
      } finally q.stop()
    }
  }

  test("event-time semantic-dedup TTL pairs and evicts under RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.StreamingSemDedup
      import graft.streaming.StreamingSemDedup.TimedVec
      // two disjoint LSH buckets (planes e0, e1): the a-family under
      // test, w-family fillers that advance the watermark without
      // refreshing the a-bucket's TTL anchor (the sign-controlled
      // shape from StreamingSemDedupSpec), state in RocksDB
      val dim = 8
      def emb(vals: Double*): Array[Float] = {
        val a = Array.fill(dim)(0f)
        vals.zipWithIndex.foreach { case (v, i) => a(i) = v.toFloat }
        a
      }
      val planes = Seq(
        StreamingSemDedup.quantize(emb(1.0)),
        StreamingSemDedup.quantize(emb(0.0, 1.0)))
      val t0 = 1000000L
      def t(ms: Long) = new java.sql.Timestamp(t0 + ms)
      val in = MemoryStream[TimedVec]
      val q = StreamingSemDedup.candidatePairsEventTime(in.toDS(), planes,
        minCos = 0.9, maxPerBucket = 8, bucketTtlMs = 1000L,
        watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName("rocks_semdedup_et")
        .outputMode("append").start()
      try {
        in.addData(TimedVec(1L, emb(1.0, -1.0), t(0L)))
        q.processAllAvailable()
        in.addData(TimedVec(2L, emb(0.9, -0.9, 0.1), t(500L)))
        q.processAllAvailable()
        assert(spark.table("rocks_semdedup_et").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
        in.addData(TimedVec(100L, emb(-1.0, 1.0), t(100000L)))
        q.processAllAvailable()
        in.addData(TimedVec(101L, emb(-0.9, 0.95), t(100001L)))
        q.processAllAvailable()
        in.addData(TimedVec(3L, emb(1.1, -1.1, 0.05), t(100002L)))
        q.processAllAvailable()
        val pairs = spark.table("rocks_semdedup_et").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
          s"evicted RocksDB state must not pair with vector 3, got $pairs")
      } finally q.stop()
    }
  }

  test("Misra-Gries bucket summaries accumulate under RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Term]
      val q = summaries(in.toDS(), buckets = 4, capacity = 4, idleTtl = None)
        .writeStream.format("memory").queryName("rocks_hh")
        .outputMode("append").start()
      try {
        in.addData((1 to 10).map(_ => Term("popular")): _*)
        q.processAllAvailable()
        in.addData((1 to 10).map(_ => Term("popular")): _*)
        q.processAllAvailable()
        val rows = spark.table("rocks_hh").as[Hitter].collect()
        // latest-row-wins (the documented consumption contract): the
        // accumulated estimate must have crossed the batch boundary
        // through RocksDB-backed state
        val latest = rows.groupBy(r => (r.bucket, r.term))
          .map { case (_, rs) => rs.maxBy(_.n) }
        assert(latest.find(_.term == "popular").map(_.est) === Some(20L),
          s"state lost across batches: ${rows.toSeq}")
      } finally q.stop()
    }
  }

  test("snapshot high-water marks and tombstone removal hold under RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Change]
      val q = StreamingSnapshot(in.toDS())
        .writeStream.format("memory").queryName("rocks_snap")
        .outputMode("update").start()
      try {
        in.addData(Change(1L, 10L, "c", "a", 1L)); q.processAllAvailable()
        // stale redelivery must hit the RocksDB-persisted high-water
        // mark from the PREVIOUS batch and emit nothing
        val before = spark.table("rocks_snap").count()
        in.addData(Change(1L, 10L, "c", "a", 1L)); q.processAllAvailable()
        assert(spark.table("rocks_snap").count() === before,
          "replay guard lost across batches")
        // update then delete, each crossing a batch boundary
        in.addData(Change(1L, 20L, "u", "b", 2L)); q.processAllAvailable()
        in.addData(Change(1L, 30L, "d", "", 0L)); q.processAllAvailable()
        val rows = spark.table("rocks_snap").as[SnapRow].collect()
        assert(rows.map(r => (r.lastEventId, r.op, r.live)).toSet ===
          Set((10L, "c", true), (20L, "u", true), (30L, "d", false)))
      } finally q.stop()
    }
  }

  test("anomaly running moments carry across micro-batches under RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Obs]
      val q = detect(in.toDS(), zThresh = 3.0, minN = 50, idleTtl = None)
        .writeStream.format("memory").queryName("rocks_anomaly")
        .outputMode("append").start()
      try {
        // baseline accumulates across TWO batches (50 + 50): the
        // outlier in batch 3 only flags if the moments crossed both
        // batch boundaries through RocksDB-backed state
        in.addData((1L to 50L).map(i =>
          Obs(i, "m", if (i % 2 == 0) 0L else 100L)): _*)
        q.processAllAvailable()
        in.addData((51L to 100L).map(i =>
          Obs(i, "m", if (i % 2 == 0) 0L else 100L)): _*)
        q.processAllAvailable()
        in.addData(Obs(999L, "m", 100000L))
        q.processAllAvailable()
        val flagged = spark.table("rocks_anomaly").as[Anomaly].collect()
        assert(flagged.map(_.obsId).toSeq === Seq(999L),
          s"moments lost across batches: ${flagged.toSeq}")
      } finally q.stop()
    }
  }

  test("funnel stage anchors carry across micro-batches under RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[StreamingFunnel.Ev]
      val q = StreamingFunnel.track(in.toDS(), windowUs = 1000L)
        .writeStream.format("memory").queryName("rocks_funnel")
        .outputMode("append").start()
      try {
        // each stage in its own batch: the purchase only completes if
        // both earlier anchors survived two RocksDB batch boundaries
        in.addData(StreamingFunnel.Ev(1L, "signup", 10L))
        q.processAllAvailable()
        in.addData(StreamingFunnel.Ev(1L, "click", 20L))
        q.processAllAvailable()
        in.addData(StreamingFunnel.Ev(1L, "purchase", 30L))
        q.processAllAvailable()
        val last = spark.table("rocks_funnel")
          .as[StreamingFunnel.FunnelRow].collect().last
        assert((last.tSignup, last.tClick, last.tPurchase) ===
          ((10L, 20L, 30L)), "stage anchors lost across batches")
        assert(last.reachedPurchase)
      } finally q.stop()
    }
  }

  test("retention credit bitmaps carry across micro-batches under RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[StreamingRetention.Ev]
      val q = StreamingRetention.track(in.toDS())
        .writeStream.format("memory").queryName("rocks_ret")
        .outputMode("append").start()
      try {
        in.addData(StreamingRetention.Ev(1L, "signup", 10L))
        q.processAllAvailable()
        // same-offset event in a later batch must NOT re-credit (the
        // bitmap survived); a day-1 event must credit exactly once
        in.addData(StreamingRetention.Ev(1L, "click", 20L),
          StreamingRetention.Ev(1L, "view",
            StreamingRetention.DayUs + 20L))
        q.processAllAvailable()
        val got = spark.table("rocks_ret")
          .as[StreamingRetention.Credit].collect().toSeq
        assert(got.map(_.offset).sorted === Seq(0L, 1L),
          s"bitmap lost or re-credited across batches: $got")
      } finally q.stop()
    }
  }

  test("session windows merge and close across micro-batches under RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val gap = 1000L
      val in = MemoryStream[StreamingSessions.Ev]
      val q = StreamingSessions.track(in.toDS(), gap)
        .writeStream.format("memory").queryName("rocks_sess")
        .outputMode("append").start()
      try {
        // the open session extends across a batch boundary (its
        // window state lives in RocksDB between the two), then a
        // far-future event advances the watermark and closes it
        in.addData(StreamingSessions.Ev(1L, 1L, 0L))
        q.processAllAvailable()
        in.addData(StreamingSessions.Ev(1L, 2L, 500L))
        q.processAllAvailable()
        in.addData(StreamingSessions.Ev(9L, -1L, 100L * gap))
        q.processAllAvailable()
        in.addData(StreamingSessions.Ev(9L, -2L, 200L * gap))
        q.processAllAvailable()
        val got = spark.table("rocks_sess")
          .filter($"user_id" === 1L)
          .select("start_ms", "end_ms", "n_events").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got === Set((0L, 500L, 2L)),
          s"session state lost across batches: $got")
      } finally q.stop()
    }
  }
}
