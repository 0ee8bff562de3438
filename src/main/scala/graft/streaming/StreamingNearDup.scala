package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.DedupQueries.{As, Bands, Bs, K, P, RowsPerBand}

/** Continuous MinHash+LSH near-duplicate detection — the streaming
  * twin of the batch `dd_minhash_lsh` query, for dedup-at-ingest in a
  * training-data pipeline: as documents stream in, each is banded by
  * its MinHash signature and compared only against the bounded recent
  * contents of its band buckets.
  *
  * Scale shape:
  *  - the signature is computed per-row (a document is one row — no
  *    aggregation, no shuffle for signing);
  *  - the only shuffle is groupByKey on (band, bucket-key), exactly
  *    the hash-partitioning LSH wants;
  *  - state per bucket is capped at `maxPerBucket` docs (FIFO), so
  *    total state is O(#active buckets × cap), independent of stream
  *    length — the eviction discipline any 100 TB stream needs.
  *
  * Same hash math as the batch query and its DuckDB oracle (md5-based
  * 60-bit shingle hash reduced mod P; k=32 affine permutations), so a
  * pair flagged here agrees with the batch candidate set.
  */
object StreamingNearDup {

  case class Doc(doc_id: Long, text: String)
  case class Banded(band: Int, key: String, doc_id: Long, sig: Array[Long])
  case class Pair(ida: Long, idb: Long, agree: Int)
  /** Event-time variants: `ts` drives the watermark + bucket TTL. */
  case class TimedDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)
  case class TimedBanded(band: Int, key: String, doc_id: Long,
    sig: Array[Long], ts: java.sql.Timestamp)

  /** 60-bit md5 hash, mod P — the per-shingle hash `h60(x) % P`. The
    * digest instance is passed in: getInstance does a provider lookup
    * + allocation, and this runs once per shingle on the ingest loop.
    */
  private def h60modP(md5: MessageDigest, s: String): Long = {
    md5.reset()
    val d = md5.digest(s.getBytes("UTF-8"))
    // first 15 hex digits = 60 bits = first 7 bytes + high nibble of the 8th
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) & 0xf0L) >> 4)
    h % P
  }

  /** Per-document MinHash signature (distinct 3-word shingles). */
  def signature(text: String): Option[Array[Long]] = {
    val words = text.split(" ", -1)
    if (words.length < 3) return None
    val md5 = MessageDigest.getInstance("MD5")
    val sig = Array.fill(K)(Long.MaxValue)
    val seen = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i + 3 <= words.length) {
      val sh = s"${words(i)} ${words(i + 1)} ${words(i + 2)}"
      if (seen.add(sh)) {
        val x = h60modP(md5, sh)
        var j = 0
        while (j < K) {
          val h = (As(j) * x + Bs(j)) % P
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    Some(sig)
  }

  private def bandKey(sig: Array[Long], band: Int): String =
    (0 until RowsPerBand)
      .map(r => sig(band * RowsPerBand + r)).mkString("_")

  /** Smallest band index where the two signatures collide (agree on
    * every row of the band). A pair meeting in bucket (band, key)
    * shares at least that band, so this is ≤ the current band; the
    * pair is emitted only by its minimum shared band's bucket — one
    * emission per pair even when several bands collide. Pure function
    * of the two signatures: every bucket computes the same answer
    * with no coordination.
    */
  private[streaming] def minSharedBand(a: Array[Long], b: Array[Long]): Int = {
    var band = 0
    while (band < Bands) {
      var r = 0
      var same = true
      while (same && r < RowsPerBand) {
        val i = band * RowsPerBand + r
        if (a(i) != b(i)) same = false
        r += 1
      }
      if (same) return band
      band += 1
    }
    Bands // unreachable for pairs that met in a bucket
  }

  /** docs → LSH-banded rows (one per band). */
  def banded(docs: Dataset[Doc]): Dataset[Banded] = {
    implicit val enc = Encoders.product[Banded]
    docs.flatMap { doc =>
      signature(doc.text) match {
        case Some(sig) =>
          (0 until Bands).map(b => Banded(b, bandKey(sig, b), doc.doc_id, sig))
        case None => Seq.empty
      }
    }
  }

  /** Stateful bucket matcher: each (band, key) bucket keeps its last
    * `maxPerBucket` (doc_id, sig) entries; a new arrival is compared
    * against them and pairs with signature agreement ≥ `minAgree`
    * are emitted (ida < idb, dedup-ordered).
    */
  /** With `emitOncePerPair` (default) a pair sharing several bands is
    * emitted exactly once — by the bucket of its minimum shared band
    * (`minSharedBand`), which every colliding bucket computes
    * identically from the two signatures. The tradeoff, under FIFO
    * cap pressure only: if eviction removed one doc from the minimum
    * band's bucket before the pair could meet there, the suppressing
    * buckets assume an emission that never happened and the pair is
    * lost. `emitOncePerPair = false` restores emit-in-every-shared-
    * band (duplicates possible, but any single surviving shared
    * bucket suffices) — choose it when recall under cap pressure
    * matters more than unique emissions.
    *
    * State boundedness has TWO dimensions: `maxPerBucket` caps one
    * bucket's entries, and `bucketTtl` evicts buckets idle longer than
    * the TTL (processing-time timeout) — without it the NUMBER of
    * bucket groups grows with every distinct signature seen, i.e.
    * linearly with stream length. Keep the default TTL in production;
    * `None` disables eviction (useful in tests — with processing-time
    * timeouts the engine schedules timeout-check batches continuously,
    * so processAllAvailable never quiesces).
    */
  def candidatePairs(
      docs: Dataset[Doc],
      minAgree: Int = 4,
      maxPerBucket: Int = 64,
      bucketTtl: Option[String] = Some("1 hour"),
      emitOncePerPair: Boolean = true): Dataset[Pair] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (bucketTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded(docs)
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        matchBucket(minAgree, maxPerBucket, bucketTtl, emitOncePerPair))
  }

  /** Shared bucket-update core: compare arrivals to retained state,
    * emit qualifying pairs if this bucket's band is the pair's minimum
    * shared band, append to bounded FIFO state. Returns (emissions,
    * new state).
    */
  private def matchCore(
      band: Int, minAgree: Int, maxPerBucket: Int, oncePerPair: Boolean,
      held0: List[(Long, Array[Long])],
      arrivals: Iterator[(Long, Array[Long])])
      : (List[Pair], List[(Long, Array[Long])]) = {
    var held = held0
    val out = scala.collection.mutable.ListBuffer.empty[Pair]
    arrivals.foreach { case (id, sig) =>
      if (!held.exists(_._1 == id)) {
        held.foreach { case (otherId, otherSig) =>
          var agree = 0
          var j = 0
          while (j < K) {
            if (otherSig(j) == sig(j)) agree += 1
            j += 1
          }
          if (agree >= minAgree &&
              (!oncePerPair || minSharedBand(sig, otherSig) == band)) {
            out += (if (otherId < id) Pair(otherId, id, agree)
              else Pair(id, otherId, agree))
          }
        }
        held = ((id, sig) :: held).take(maxPerBucket)
      }
    }
    (out.toList, held)
  }

  /** One bucket's update: compare arrivals to retained state, emit
    * qualifying pairs, append to bounded FIFO state. A timeout firing
    * for an idle bucket drops its state.
    */
  def matchBucket(minAgree: Int, maxPerBucket: Int,
      bucketTtl: Option[String], emitOncePerPair: Boolean = true)(
      key: (Int, String),
      rows: Iterator[Banded],
      state: GroupState[List[(Long, Array[Long])]]): Iterator[Pair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val (out, held) = matchCore(key._1, minAgree, maxPerBucket,
      emitOncePerPair, state.getOption.getOrElse(Nil),
      rows.map(b => (b.doc_id, b.sig)))
    state.update(held)
    bucketTtl.foreach(state.setTimeoutDuration)
    out.iterator
  }

  // ----------------------------------------------------------------
  // Event-time variant: the TTL rides the watermark, so bucket
  // eviction is driven by the data's own clock (reprocessing a
  // backlog evicts identically), matching the rest of the event-time
  // operator surface — processing-time TTL ages state by wall clock
  // even during catch-up.
  // ----------------------------------------------------------------

  /** docs → LSH-banded rows carrying the event time. */
  def bandedTimed(docs: Dataset[TimedDoc]): Dataset[TimedBanded] = {
    implicit val enc = Encoders.product[TimedBanded]
    docs.flatMap { doc =>
      signature(doc.text) match {
        case Some(sig) =>
          (0 until Bands).map(b =>
            TimedBanded(b, bandKey(sig, b), doc.doc_id, sig, doc.ts))
        case None => Seq.empty
      }
    }
  }

  /** Event-time bucket state: held (doc, signature) entries plus the
    * newest event time the bucket has EVER seen — the TTL anchor must
    * be the bucket's max, not the current batch's max, or a late
    * (within-watermark) arrival would move the deadline EARLIER and
    * prematurely evict state.
    *
    * State-schema note: changing this class's shape breaks
    * restart-from-checkpoint for running `candidatePairsEventTime`
    * streams (Spark's state schema check rejects the mismatch at
    * start). Evolve it only with a fresh checkpoint dir, or behind a
    * versioned state wrapper.
    */
  case class TimedBucket(held: List[(Long, Array[Long])], maxTs: Long)

  /** Event-time twin of `candidatePairs`: buckets idle past
    * `bucketTtl` *in event time* (watermarked by `watermarkDelay`)
    * are dropped. Same pairing/emission semantics.
    */
  def candidatePairsEventTime(
      docs: Dataset[TimedDoc],
      minAgree: Int = 4,
      maxPerBucket: Int = 64,
      bucketTtlMs: Long = 3600L * 1000,
      watermarkDelay: String = "10 minutes",
      emitOncePerPair: Boolean = true): Dataset[Pair] = {
    import docs.sparkSession.implicits._
    bandedTimed(docs)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        matchBucketEventTime(minAgree, maxPerBucket, bucketTtlMs,
          emitOncePerPair))
  }

  /** Event-time bucket update: state times out when the watermark
    * passes (newest event this bucket has ever seen) + TTL.
    */
  def matchBucketEventTime(minAgree: Int, maxPerBucket: Int,
      bucketTtlMs: Long, emitOncePerPair: Boolean = true)(
      key: (Int, String),
      rows: Iterator[TimedBanded],
      state: GroupState[TimedBucket]): Iterator[Pair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.getOrElse(TimedBucket(Nil, Long.MinValue))
    var maxTs = prev.maxTs
    val arrivals = rows.map { b =>
      if (b.ts.getTime > maxTs) maxTs = b.ts.getTime
      (b.doc_id, b.sig)
    }
    val (out, held) = matchCore(key._1, minAgree, maxPerBucket,
      emitOncePerPair, prev.held, arrivals)
    // arrivals is lazy: maxTs is valid only after matchCore consumed it
    state.update(TimedBucket(held, maxTs))
    // Never set a timeout at/below the current watermark (Spark
    // rejects it): an already-expired deadline fires at watermark+1.
    val floor = state.getCurrentWatermarkMs() + 1
    if (maxTs != Long.MinValue)
      state.setTimeoutTimestamp(math.max(maxTs + bucketTtlMs, floor))
    out.iterator
  }
}
