package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSemDedup.{Vec, SemPair}

/** The embedding near-dup streaming twin against an INDEPENDENT
  * brute-force oracle: quantize → bucket → all-pairs-within-bucket →
  * cosine threshold, computed here in plain Scala with no shared
  * operator code beyond the arithmetic primitives, over arrivals
  * split across micro-batches. Pins batch parity (the same pairs the
  * dd_embed_cosine scan flags), cross-batch state carry, FIFO cap
  * eviction, and identical behavior under the RocksDB state store.
  */
class StreamingSemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val Dim = 8

  /** Deterministic synthetic embeddings: three "topic" anchors with
    * small per-vector perturbations, so near-dups exist within topics
    * and cross-topic cosines stay low. No RNG — values derive from
    * the id.
    */
  private def vec(id: Long): Vec = {
    val topic = (id % 3).toInt
    val emb = Array.tabulate(Dim) { j =>
      val base = if (j % 3 == topic) 1.0f else 0.05f
      base + 0.01f * ((id * 7 + j * 13) % 5)
    }
    Vec(id, emb)
  }

  private def bruteForcePairs(vs: Seq[Vec], planes: Seq[Array[Long]],
      minCos: Double): Set[(Long, Long)] = {
    val q = vs.map(v => v.vec_id ->
      StreamingSemDedup.quantize(v.embedding)).toMap
    def n2(id: Long) = StreamingSemDedup.dot(q(id), q(id))
    def bucket(id: Long) = StreamingSemDedup.bucketOf(q(id), planes)
    (for {
      a <- vs; b <- vs
      if a.vec_id < b.vec_id
      if bucket(a.vec_id) == bucket(b.vec_id)
      if n2(a.vec_id) > 0 && n2(b.vec_id) > 0
      cos = StreamingSemDedup.dot(q(a.vec_id), q(b.vec_id)) /
        (math.sqrt(n2(a.vec_id).toDouble) * math.sqrt(n2(b.vec_id).toDouble))
      if cos >= minCos
    } yield (a.vec_id, b.vec_id)).toSet
  }

  private def runStream(batches: Seq[Seq[Vec]], planes: Seq[Array[Long]],
      minCos: Double, maxPerBucket: Int = 256,
      name: String = s"semdedup_${System.nanoTime()}"): Seq[SemPair] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Vec]
    val q = StreamingSemDedup.candidatePairs(in.toDS(), planes, minCos,
      maxPerBucket, bucketTtl = None)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[SemPair].collect().toSeq
    } finally q.stop()
  }

  test("cross-batch pairs match the brute-force oracle") {
    val all = (0L until 60L).map(vec)
    val planes = StreamingSemDedup.planesOf(all, 3)
    val batches = all.grouped(20).toSeq
    val got = runStream(batches, planes, minCos = 0.9)
    val expect = bruteForcePairs(all, planes, minCos = 0.9)
    assert(expect.nonEmpty, "oracle found no pairs — test vacuous")
    assert(got.map(p => (p.ida, p.idb)).toSet === expect)
    // cosine values match the quantized-integer arithmetic exactly
    got.foreach { p =>
      val q = Map(p.ida -> StreamingSemDedup.quantize(vec(p.ida).embedding),
        p.idb -> StreamingSemDedup.quantize(vec(p.idb).embedding))
      val c = StreamingSemDedup.dot(q(p.ida), q(p.idb)) /
        (math.sqrt(StreamingSemDedup.dot(q(p.ida), q(p.ida)).toDouble) *
          math.sqrt(StreamingSemDedup.dot(q(p.idb), q(p.idb)).toDouble))
      assert(p.cos === c)
    }
  }

  test("a vector never pairs across different buckets") {
    val all = (0L until 60L).map(vec)
    val planes = StreamingSemDedup.planesOf(all, 3)
    val got = runStream(Seq(all), planes, minCos = -1.0)
    val q = all.map(v => v.vec_id ->
      StreamingSemDedup.quantize(v.embedding)).toMap
    got.foreach { p =>
      assert(StreamingSemDedup.bucketOf(q(p.ida), planes)
        === StreamingSemDedup.bucketOf(q(p.idb), planes))
    }
  }

  test("FIFO cap evicts oldest bucket entries") {
    // same-topic vectors land in one bucket; with cap 2, vector 0 is
    // evicted by the time vector 9 arrives, so (0, 9) never pairs
    // even though their cosine clears the threshold
    val sameTopic = (0L until 10L).map(i => vec(i * 3)) // topic 0 only
    val planes = StreamingSemDedup.planesOf(sameTopic, 2)
    val got = runStream(sameTopic.map(Seq(_)), planes,
      minCos = -1.0, maxPerBucket = 2)
    val pairs = got.map(p => (p.ida, p.idb)).toSet
    assert(!pairs.contains((0L, 27L)),
      "evicted vector paired — FIFO cap not enforced")
    // adjacent arrivals (still in state) do pair
    assert(pairs.contains((24L, 27L)))
  }

  test("event-time variant: pairs inside the TTL; watermark evicts idle buckets") {
    import spark.implicits._
    import graft.streaming.StreamingSemDedup.TimedVec
    implicit val sqlCtx = spark.sqlContext
    // sign-controlled vectors: the `vec()` corpus is all-positive, so
    // under any plane every vector shares ONE bucket and a
    // watermark-advancing filler would refresh that bucket's TTL
    // anchor forever. Build explicit planes (e0, e1) and two
    // DISJOINT buckets: the a-family (x>0, y<0 → bucket 1) under
    // test, and w-family fillers (x<0, y>0 → bucket 2) that advance
    // the watermark without touching the a-bucket's state.
    def emb(vals: Double*): Array[Float] = {
      val a = Array.fill(Dim)(0f)
      vals.zipWithIndex.foreach { case (v, i) => a(i) = v.toFloat }
      a
    }
    val planes = Seq(
      StreamingSemDedup.quantize(emb(1.0)),
      StreamingSemDedup.quantize(emb(0.0, 1.0)))
    val a1 = emb(1.0, -1.0)
    val a2 = emb(0.9, -0.9, 0.1)
    val a3 = emb(1.1, -1.1, 0.05)
    val w1 = emb(-1.0, 1.0)
    val w2 = emb(-0.9, 0.95)
    val t0 = 1000000L // offset: rows at/below initial watermark drop as late
    def t(ms: Long) = new java.sql.Timestamp(t0 + ms)
    val in = MemoryStream[TimedVec]
    val q = StreamingSemDedup.candidatePairsEventTime(in.toDS(), planes,
      minCos = 0.9, maxPerBucket = 8, bucketTtlMs = 1000L,
      watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("semdedup_et")
      .outputMode("append").start()
    try {
      in.addData(TimedVec(1L, a1, t(0L)))
      q.processAllAvailable()
      in.addData(TimedVec(2L, a2, t(500L))) // inside TTL → pairs
      q.processAllAvailable()
      assert(spark.table("semdedup_et").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
      // advance the watermark far past the a-bucket's deadline from
      // the other bucket, let the timeout batch fire, then a fresh
      // near-dup of a1 finds its bucket empty: no new a-pair
      in.addData(TimedVec(100L, w1, t(100000L)))
      q.processAllAvailable()
      in.addData(TimedVec(101L, w2, t(100001L)))
      q.processAllAvailable()
      in.addData(TimedVec(3L, a3, t(100002L)))
      q.processAllAvailable()
      val pairs = spark.table("semdedup_et").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
        s"evicted state must not pair with vector 3, got $pairs")
    } finally q.stop()
  }

  test("identical pairs under the RocksDB state store") {
    val RocksDb =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    try {
      val all = (0L until 60L).map(vec)
      val planes = StreamingSemDedup.planesOf(all, 3)
      val got = runStream(all.grouped(20).toSeq, planes, minCos = 0.9,
        name = s"semdedup_rocks_${System.nanoTime()}")
      assert(got.map(p => (p.ida, p.idb)).toSet
        === bruteForcePairs(all, planes, minCos = 0.9))
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
