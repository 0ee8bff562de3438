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
  /** A pair surfacing in several bands is emitted once per band —
    * dedup downstream (a second stateful operator in the same query
    * would chain stateful stages; sinks or a batch pass handle it).
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
      bucketTtl: Option[String] = Some("1 hour")): Dataset[Pair] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (bucketTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded(docs)
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        matchBucket(minAgree, maxPerBucket, bucketTtl))
  }

  /** One bucket's update: compare arrivals to retained state, emit
    * qualifying pairs, append to bounded FIFO state. A timeout firing
    * for an idle bucket drops its state.
    */
  def matchBucket(minAgree: Int, maxPerBucket: Int,
      bucketTtl: Option[String])(
      key: (Int, String),
      rows: Iterator[Banded],
      state: GroupState[List[(Long, Array[Long])]]): Iterator[Pair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var held = state.getOption.getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer.empty[Pair]
    rows.foreach { b =>
      if (!held.exists(_._1 == b.doc_id)) {
        held.foreach { case (otherId, otherSig) =>
          var agree = 0
          var j = 0
          while (j < K) {
            if (otherSig(j) == b.sig(j)) agree += 1
            j += 1
          }
          if (agree >= minAgree) {
            out += (if (otherId < b.doc_id) Pair(otherId, b.doc_id, agree)
              else Pair(b.doc_id, otherId, agree))
          }
        }
        held = ((b.doc_id, b.sig) :: held).take(maxPerBucket)
      }
    }
    state.update(held)
    bucketTtl.foreach(state.setTimeoutDuration)
    out.iterator
  }
}
