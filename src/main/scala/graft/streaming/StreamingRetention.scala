package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous cohort-retention tracking — the streaming twin of the
  * batch `rel_retention` query: users cohorted by their first
  * signup's day, counted as retained at day-offset k (0..maxOffset)
  * when any of their events lands on the k-th day after signup —
  * maintained at ingest instead of recomputed nightly.
  *
  * State discipline: TWO longs per user forever — the signup anchor
  * timestamp and a bitmap of already-credited offsets (maxOffset <=
  * 63 by construction). The bitmap is what makes the emission
  * increment-exact: a (user, offset) pair is credited at most once,
  * so the sink-side count of emitted increments per (cohort_day,
  * offset) IS the retention matrix — no dedup pass downstream, and
  * redelivered events are no-ops.
  *
  * Ordering contract (same as StreamingFunnel): per-user arrivals in
  * event-time order reproduce the batch query exactly (the first
  * signup seen is the min signup; pre-signup events don't count).
  * Intra-batch arrival order is immaterial — each group folds in
  * event-time order with signups first on timestamp ties, matching
  * the batch's t >= t0 inclusion of same-instant events.
  */
object StreamingRetention {

  case class Ev(userId: Long, eventType: String, t: Long)

  /** Public + flat for the state encoder. t0 < 0 = no signup yet. */
  case class RetState(t0: Long, seenMask: Long)

  /** One retention credit: this user's first event at this offset. */
  case class Credit(cohortDay: Long, offset: Long, userId: Long)

  final val DayUs = 86400000000L

  def track(
      events: Dataset[Ev],
      maxOffset: Long = 7L,
      idleTtl: Option[String] = None): Dataset[Credit] = {
    require(maxOffset >= 0 && maxOffset <= 63,
      s"maxOffset must fit the 64-bit seen bitmap, got $maxOffset")
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        updateUser(maxOffset, idleTtl))
  }

  private def updateUser(maxOffset: Long, idleTtl: Option[String])(
      userId: Long,
      rows: Iterator[Ev],
      state: GroupState[RetState]): Iterator[Credit] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(RetState(-1L, 0L))
    val out = Seq.newBuilder[Credit]
    // event-time order; signups first on ties so a same-instant event
    // credits offset 0, as in the batch query
    for (e <- rows.toSeq.sortBy(e =>
        (e.t, if (e.eventType == "signup") 0 else 1))) {
      if (e.eventType == "signup" && st.t0 < 0) st = st.copy(t0 = e.t)
      if (st.t0 >= 0 && e.t >= st.t0) {
        val off = (e.t - st.t0) / DayUs
        if (off <= maxOffset && ((st.seenMask >> off) & 1L) == 0L) {
          st = st.copy(seenMask = st.seenMask | (1L << off))
          out += Credit(st.t0 / DayUs, off, userId)
        }
      }
    }
    idleTtl.foreach(state.setTimeoutDuration)
    val credits = out.result()
    if (credits.nonEmpty || state.getOption.forall(_ != st))
      state.update(st)
    credits.iterator
  }
}
