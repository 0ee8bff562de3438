package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous EMBEDDING near-duplicate detection — the streaming twin
  * of the batch `dd_embed_cosine` bucketed pair scan, for semantic
  * dedup-at-ingest: as embedded documents stream in, each vector is
  * assigned its random-hyperplane LSH bucket and compared only
  * against the bounded recent contents of that bucket; pairs at or
  * above the cosine threshold are emitted.
  *
  * Scale shape (mirrors [[StreamingNearDup]]):
  *  - quantization + bucket assignment are per-row (no shuffle);
  *    the plane table is a driver-provided constant (≤ 20 vectors),
  *    the closure-captured equivalent of the batch side's broadcast;
  *  - the only shuffle is groupByKey on the bucket id — exactly the
  *    hash partitioning the LSH wants, and 2^planes tracks corpus
  *    size (the same knob the batch side derives from N);
  *  - state per bucket is capped at `maxPerBucket` vectors (FIFO)
  *    and idle buckets expire after `bucketTtl`, so total state is
  *    O(active buckets × cap), independent of stream length.
  *
  * Same arithmetic as the batch query and its DuckDB oracle: vectors
  * quantized to round-half-up(x·10⁴) longs (the exact Catalyst
  * `round(x*10000, 0)` semantics, BigDecimal.valueOf based), integer
  * dot products, bucket bit i set iff dot(q, plane_i) > 0, cosine =
  * dot / (√n²_a · √n²_b) on the quantized integers — so a pair
  * flagged here is the pair the batch scan flags on the same data,
  * which the parity spec pins against an independent brute-force
  * oracle.
  */
object StreamingSemDedup {

  case class Vec(vec_id: Long, embedding: Array[Float])
  case class Bucketed(bucket: Long, vec_id: Long, q: Array[Long], n2: Long)
  case class SemPair(ida: Long, idb: Long, cos: Double)
  /** Event-time variants: `ts` drives the watermark + bucket TTL. */
  case class TimedVec(vec_id: Long, embedding: Array[Float],
    ts: java.sql.Timestamp)
  case class TimedBucketed(bucket: Long, vec_id: Long, q: Array[Long],
    n2: Long, ts: java.sql.Timestamp)

  /** round-half-up(x·10⁴) per element — EXACTLY Catalyst's
    * `round(cast(x as double) * 10000, 0).cast(long)`: the float is
    * promoted to double, scaled, and rounded via
    * BigDecimal.valueOf(d).setScale(0, HALF_UP) (valueOf goes through
    * Double.toString, which is what Catalyst's Round does for
    * DoubleType — a new BigDecimal(d) exact-binary constructor would
    * round a handful of values differently).
    */
  private[streaming] def quantize(emb: Array[Float]): Array[Long] = {
    val out = new Array[Long](emb.length)
    var i = 0
    while (i < emb.length) {
      val d = emb(i).toDouble * 10000.0
      out(i) = java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    out
  }

  private[streaming] def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Bucket id: bit i set iff dot(q, planes(i)) > 0 — the batch
    * side's sum(2^pid · [dot > 0]) with pid = plane index.
    */
  private[streaming] def bucketOf(q: Array[Long],
      planes: Seq[Array[Long]]): Long = {
    var b = 0L
    var i = 0
    while (i < planes.length) {
      if (dot(q, planes(i)) > 0) b |= (1L << i)
      i += 1
    }
    b
  }

  /** The batch convention's plane set from already-arrived vectors:
    * the first `n` vectors by id, quantized, ordered by id (plane
    * index = rank). Lets a parity test (or a bootstrap job) derive
    * the planes the batch queries would use.
    */
  def planesOf(vecs: Seq[Vec], n: Int): Seq[Array[Long]] =
    vecs.sortBy(_.vec_id).take(n).map(v => quantize(v.embedding))

  /** vectors → (bucket, id, q, n2) rows, one per vector. */
  def bucketed(vecs: Dataset[Vec],
      planes: Seq[Array[Long]]): Dataset[Bucketed] = {
    implicit val enc = Encoders.product[Bucketed]
    vecs.map { v =>
      val q = quantize(v.embedding)
      Bucketed(bucketOf(q, planes), v.vec_id, q, dot(q, q))
    }
  }

  /** Stateful bucket matcher: each bucket keeps its last
    * `maxPerBucket` (id, q, n2) entries; a new arrival is compared
    * against them and pairs with cosine ≥ `minCos` are emitted
    * (ida < idb). Unlike the MinHash twin there is no multi-band
    * dedup problem — a vector lives in exactly one bucket, so a pair
    * is emitted at most once by construction. `bucketTtl` evicts
    * idle buckets (processing-time timeout); `None` disables
    * eviction for tests (processing-time timeouts keep scheduling
    * batches, so processAllAvailable never quiesces).
    */
  def candidatePairs(
      vecs: Dataset[Vec],
      planes: Seq[Array[Long]],
      minCos: Double = 0.35,
      maxPerBucket: Int = 256,
      bucketTtl: Option[String] = Some("1 hour")): Dataset[SemPair] = {
    import vecs.sparkSession.implicits._
    val timeoutConf =
      if (bucketTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bucketed(vecs, planes)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        matchBucket(minCos, maxPerBucket, bucketTtl))
  }

  /** One bucket's update: compare arrivals against retained state,
    * emit qualifying pairs, append to bounded FIFO state. Zero-norm
    * vectors never pair (the batch side's NaN cosine fails every
    * threshold) but still occupy a state slot, matching the batch
    * scan's bucket population. A timeout firing for an idle bucket
    * drops its state.
    */
  def matchBucket(minCos: Double, maxPerBucket: Int,
      bucketTtl: Option[String])(
      key: Long,
      rows: Iterator[Bucketed],
      state: GroupState[List[(Long, Array[Long], Long)]])
      : Iterator[SemPair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var held = state.getOption.getOrElse(Nil)
    val out = scala.collection.mutable.ListBuffer.empty[SemPair]
    rows.foreach { v =>
      if (!held.exists(_._1 == v.vec_id)) {
        held.foreach { case (otherId, otherQ, otherN2) =>
          if (v.n2 > 0 && otherN2 > 0) {
            val cos = dot(v.q, otherQ) /
              (math.sqrt(v.n2.toDouble) * math.sqrt(otherN2.toDouble))
            if (cos >= minCos) {
              out += (if (otherId < v.vec_id)
                SemPair(otherId, v.vec_id, cos)
              else SemPair(v.vec_id, otherId, cos))
            }
          }
        }
        held = ((v.vec_id, v.q, v.n2) :: held).take(maxPerBucket)
      }
    }
    state.update(held)
    bucketTtl.foreach(state.setTimeoutDuration)
    out.iterator
  }

  // ----------------------------------------------------------------
  // Event-time variant: the TTL rides the watermark, so bucket
  // eviction is driven by the data's own clock (reprocessing a
  // backlog evicts identically) — the same discipline as
  // StreamingNearDup's event-time twin; processing-time TTL ages
  // state by wall clock even during catch-up.
  // ----------------------------------------------------------------

  /** vectors → bucketed rows carrying the event time. */
  def bucketedTimed(vecs: Dataset[TimedVec],
      planes: Seq[Array[Long]]): Dataset[TimedBucketed] = {
    implicit val enc = Encoders.product[TimedBucketed]
    vecs.map { v =>
      val q = quantize(v.embedding)
      TimedBucketed(bucketOf(q, planes), v.vec_id, q, dot(q, q), v.ts)
    }
  }

  /** Event-time bucket state: held (id, q, n2) entries plus the
    * newest event time the bucket has EVER seen — the TTL anchor
    * must be the bucket's max, not the current batch's max, or a
    * late (within-watermark) arrival would move the deadline EARLIER
    * and prematurely evict state. Changing this class's shape breaks
    * restart-from-checkpoint for running streams (state schema
    * check); evolve only with a fresh checkpoint dir.
    */
  case class TimedBucket(held: List[(Long, Array[Long], Long)], maxTs: Long)

  /** Event-time twin of [[candidatePairs]]: buckets idle past
    * `bucketTtlMs` in EVENT time (watermarked by `watermarkDelay`)
    * are dropped. Same pairing semantics.
    */
  def candidatePairsEventTime(
      vecs: Dataset[TimedVec],
      planes: Seq[Array[Long]],
      minCos: Double = 0.35,
      maxPerBucket: Int = 256,
      bucketTtlMs: Long = 3600L * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[SemPair] = {
    import vecs.sparkSession.implicits._
    bucketedTimed(vecs, planes)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        matchBucketEventTime(minCos, maxPerBucket, bucketTtlMs))
  }

  /** Event-time bucket update: state times out when the watermark
    * passes (newest event this bucket has ever seen) + TTL.
    */
  def matchBucketEventTime(minCos: Double, maxPerBucket: Int,
      bucketTtlMs: Long)(
      key: Long,
      rows: Iterator[TimedBucketed],
      state: GroupState[TimedBucket]): Iterator[SemPair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.getOrElse(TimedBucket(Nil, Long.MinValue))
    var held = prev.held
    var maxTs = prev.maxTs
    val out = scala.collection.mutable.ListBuffer.empty[SemPair]
    rows.foreach { v =>
      if (v.ts.getTime > maxTs) maxTs = v.ts.getTime
      if (!held.exists(_._1 == v.vec_id)) {
        held.foreach { case (otherId, otherQ, otherN2) =>
          if (v.n2 > 0 && otherN2 > 0) {
            val cos = dot(v.q, otherQ) /
              (math.sqrt(v.n2.toDouble) * math.sqrt(otherN2.toDouble))
            if (cos >= minCos) {
              out += (if (otherId < v.vec_id)
                SemPair(otherId, v.vec_id, cos)
              else SemPair(v.vec_id, otherId, cos))
            }
          }
        }
        held = ((v.vec_id, v.q, v.n2) :: held).take(maxPerBucket)
      }
    }
    state.update(TimedBucket(held, maxTs))
    // Never set a timeout at/below the current watermark (Spark
    // rejects it): an already-expired deadline fires at watermark+1.
    val floor = state.getCurrentWatermarkMs() + 1
    if (maxTs != Long.MinValue)
      state.setTimeoutTimestamp(math.max(maxTs + bucketTtlMs, floor))
    out.iterator
  }
}
