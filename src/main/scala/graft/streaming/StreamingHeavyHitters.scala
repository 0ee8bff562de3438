package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous heavy-hitter tracking — the streaming twin of the batch
  * `tx_cms_topk` sketch, for frequency monitoring at ingest (which
  * domains/templates/n-grams dominate the crawl RIGHT NOW, without
  * a corpus-wide count).
  *
  * Shape: terms hash into `buckets` groups; each group keeps a
  * Misra-Gries summary of `capacity` counters (Misra & Gries 1982,
  * "Finding repeated elements"). Every arrival either increments its
  * counter, claims a free slot, or decrements the whole summary — so
  * state is O(buckets × capacity) FOREVER, independent of stream
  * length or vocabulary: the eviction discipline a 100 TB/day stream
  * needs (per-term exact counting via mapGroupsWithState would grow
  * state with the vocabulary).
  *
  * Guarantee (per bucket, n = arrivals routed to it): any term with
  * true count > n/(capacity+1) is retained, and
  * est ≤ true ≤ est + n/(capacity+1). Emissions carry n so consumers
  * can compute the bound.
  *
  * The only shuffle is groupByKey on the bucket id — the same
  * hash-partitioning a distributed sketch wants; summaries merge
  * downstream by summing (bucket, term) rows.
  */
object StreamingHeavyHitters {

  case class Term(term: String)

  /** One summary row, emitted for every touched bucket per
    * micro-batch: the current estimate and the bucket's arrival count
    * (⇒ error bound n/(capacity+1)) as of that batch.
    */
  case class Hitter(bucket: Int, term: String, est: Long, n: Long)

  // counts as an assoc list, not Map, and the class public: the state
  // encoder's generated code can neither encode a Map field nor reach
  // a private nested class (Janino "no applicable constructor/method"
  // in both cases). Same shape as StreamingNearDup's TimedBucket.
  case class MgState(counts: List[(String, Long)], n: Long)

  /** One Misra-Gries step. Decrements drop zeroed counters, freeing
    * slots for later claimants.
    */
  private[streaming] def mgUpdate(
      counts: Map[String, Long], term: String, capacity: Int)
      : Map[String, Long] =
    counts.get(term) match {
      case Some(c) => counts.updated(term, c + 1)
      case None if counts.size < capacity => counts.updated(term, 1L)
      case None =>
        counts.flatMap { case (t, c) =>
          if (c > 1) Some(t -> (c - 1)) else None
        }
    }

  /** Deterministic term→bucket routing (same fold as the batch
    * fingerprint family — stable across engines and sessions).
    */
  private[streaming] def bucketOf(term: String, buckets: Int): Int = {
    var h = 0L
    var i = 0
    while (i < term.length) {
      h = (h * 31L + term.charAt(i)) % 1000000007L
      i += 1
    }
    (h % buckets).toInt
  }

  /** terms → per-batch heavy-hitter summaries. `idleTtl` evicts
    * buckets idle longer than the TTL (without it, bucket-group count
    * is already bounded by `buckets` — the TTL just reclaims state for
    * retired routing ranges); `None` disables timeouts so tests'
    * processAllAvailable quiesces.
    *
    * CONSUMPTION CONTRACT (Append mode): every touched bucket
    * re-emits its FULL current summary (all ≤ capacity tracked
    * counters, not a top-k cut) each micro-batch, so an accumulating
    * sink (memory/file) holds one row per (bucket, term) per batch
    * that touched the bucket. The current estimate for a term is the
    * LATEST row per (bucket, term) — latest-row-wins; earlier rows are
    * superseded snapshots, and summing across rows double-counts.
    * `Hitter.n` (the bucket's total observation count) is
    * monotonically non-decreasing per bucket, so "latest" can be
    * selected without event-time: max `n` per (bucket, term).
    */
  def summaries(
      terms: Dataset[Term],
      buckets: Int = 16,
      capacity: Int = 8,
      idleTtl: Option[String] = Some("1 hour")): Dataset[Hitter] = {
    import terms.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    terms
      .groupByKey(t => bucketOf(t.term, buckets))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        updateBucket(capacity, idleTtl))
  }

  /** Old name for [[summaries]] — misleading (all ≤ capacity counters
    * are emitted, not a top-k). Kept as a forwarder for source compat.
    */
  @deprecated("use summaries — every tracked counter is emitted, not a top-k",
    "round 5")
  def topK(
      terms: Dataset[Term],
      buckets: Int = 16,
      capacity: Int = 8,
      idleTtl: Option[String] = Some("1 hour")): Dataset[Hitter] =
    summaries(terms, buckets, capacity, idleTtl)

  private def updateBucket(capacity: Int, idleTtl: Option[String])(
      bucket: Int,
      rows: Iterator[Term],
      state: GroupState[MgState]): Iterator[Hitter] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val st0 = state.getOption.getOrElse(MgState(Nil, 0L))
      var counts = st0.counts.toMap
      var n = st0.n
      rows.foreach { t =>
        counts = mgUpdate(counts, t.term, capacity)
        n += 1
      }
      state.update(MgState(counts.toList, n))
      idleTtl.foreach(state.setTimeoutDuration)
      counts.toSeq.sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => Hitter(bucket, t, c, n) }
        .iterator
    }
  }
}
