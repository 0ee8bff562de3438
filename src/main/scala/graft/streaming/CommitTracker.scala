package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's contiguous-prefix commit tracker (C1,
  * `committing/commit_processing.py:21-138`) rebuilt standalone as a
  * pure state machine + a `flatMapGroupsWithState` wrapper.
  *
  * Spark's checkpoint normally *replaces* this logic (the Pipeline
  * relies on it); this operator exists for deployments that need the
  * reference's exact commit semantics against an external token store
  * — e.g. several independent readers multiplexed through one stream,
  * each with its own confirm ordering.
  *
  * Semantics preserved from the reference:
  *  - events arrive as (count, needConfirm, token); needConfirm=true
  *    marks in-flight, needConfirm=false confirms (or directly
  *    confirms counts that never went in-flight);
  *  - duplicate/stale events merge tokens (newest non-empty wins,
  *    `_get_actual_token`); counts at or below the committed watermark
  *    are dropped;
  *  - a commit covers the longest contiguous confirmed prefix above
  *    the watermark, up to the *last token-bearing* event in it
  *    (tokenless confirmed tails wait for a token);
  *  - committed counts are evicted from state (bounded memory).
  *
  * The reference's time/size flush thresholds (C2) map to the
  * micro-batch trigger: every batch plays one RecheckCommitEvent.
  */
object CommitTracker {

  case class CommitInput(
      readerId: String,
      count: Long,
      needConfirm: Boolean,
      token: Option[String])

  case class Committable(
      readerId: String,
      fromCount: Long,
      toCount: Long,
      token: String)

  case class TrackerState(
      lastCommitted: Long,
      confirmed: Map[Long, Option[String]],
      unconfirmed: Map[Long, Option[String]])

  val emptyState: TrackerState = TrackerState(0L, Map.empty, Map.empty)

  /** newest non-empty token wins (`_get_actual_token`). */
  private def mergeToken(
      old: Option[String], nw: Option[String]): Option[String] =
    nw.filter(_.nonEmpty).orElse(old.filter(_.nonEmpty))

  /** Pure transition for one event. */
  def ingest(st: TrackerState, ev: CommitInput): TrackerState = {
    if (ev.count <= st.lastCommitted) st
    else if (ev.needConfirm) {
      if (st.confirmed.contains(ev.count)) st
      else {
        val tok = mergeToken(st.unconfirmed.getOrElse(ev.count, None), ev.token)
        st.copy(unconfirmed = st.unconfirmed + (ev.count -> tok))
      }
    } else {
      val tok = mergeToken(
        st.unconfirmed.getOrElse(ev.count,
          st.confirmed.getOrElse(ev.count, None)),
        ev.token)
      st.copy(
        confirmed = st.confirmed + (ev.count -> tok),
        unconfirmed = st.unconfirmed - ev.count)
    }
  }

  /** Longest contiguous confirmed prefix above the watermark, cut at
    * the last token-bearing count. None if no token-bearing count is
    * reachable.
    */
  def committablePrefix(st: TrackerState): Option[(Long, String)] = {
    var c = st.lastCommitted + 1
    var lastWithToken = Option.empty[(Long, String)]
    while (st.confirmed.contains(c)) {
      st.confirmed(c).filter(_.nonEmpty)
        .foreach(t => lastWithToken = Some((c, t)))
      c += 1
    }
    lastWithToken
  }

  /** Evict committed counts and advance the watermark. */
  def advance(st: TrackerState, to: Long): TrackerState =
    TrackerState(
      lastCommitted = to,
      confirmed = st.confirmed.filter(_._1 > to),
      unconfirmed = st.unconfirmed.filter(_._1 > to))

  /** Drain: ingest a batch of events, emit at most one Committable
    * covering the new prefix, return the advanced state.
    */
  def drain(st: TrackerState, evs: Iterator[CommitInput],
      readerId: String): (TrackerState, Iterator[Committable]) = {
    val afterIngest = evs.foldLeft(st)(ingest)
    committablePrefix(afterIngest) match {
      case Some((to, tok)) =>
        val out = Committable(readerId, afterIngest.lastCommitted + 1, to, tok)
        (advance(afterIngest, to), Iterator.single(out))
      case None => (afterIngest, Iterator.empty)
    }
  }

  /** Streaming form: one state per readerId; each micro-batch plays a
    * recheck tick. State size is O(out-of-order window), not stream
    * length — committed counts are evicted every batch.
    */
  def trackStream(ds: Dataset[CommitInput]): Dataset[Committable] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.readerId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, evs: Iterator[CommitInput],
         state: GroupState[TrackerState]) => {
          val st = state.getOption.getOrElse(emptyState)
          val (next, out) = drain(st, evs, key)
          state.update(next)
          out
        })
  }
}
