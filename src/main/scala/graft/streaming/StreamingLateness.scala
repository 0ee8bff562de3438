package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** At-ingest event-time lateness monitor — the streaming twin of the
  * batch `cdc_ooo_profile` scan, and the live form of the measurement
  * that sizes a `withWatermark` delay. The reference consumes the
  * change stream in resume-token order (`change_stream_reading/
  * change_stream_reader.py:35-37` iterates the cursor; `resume_token
  * .py` anchors restarts), which is ARRIVAL order; event time (the
  * change's cluster timestamp) can run behind it whenever a sharded
  * source merges ordered shards. A downstream event-time consumer has
  * to pick a watermark delay before it sees the data — this operator
  * emits, the moment it happens, every event that arrives LATE
  * relative to an earlier-arriving event of the SAME key, with its
  * inversion depth in milliseconds.
  *
  * Per-key, not global, for the same reason the batch profile is:
  * cross-key skew is normal in a sharded source, and per-key
  * inversion depth is what keyed state actually buffers. State per
  * key is two longs — the max event time seen and the applied
  * high-water event id. The high-water makes at-least-once replay
  * idempotent (resume-token replay restarts BEHIND the high-water,
  * never ahead — the StreamingGapDetect discipline): a redelivered
  * event id at or below it emits nothing and mutates nothing.
  *
  * Emission is Append: one immutable (key, op_type, event_id,
  * late_ms) observation per late arrival — the alert feed a pipeline
  * operator aggregates into the live watermark-sizing profile (the
  * batch profile's n_late / max_late_ms / n_late_users are exactly
  * count / max / countDistinct over this feed).
  * StreamingLatenessSpec pins profile equality with the batch
  * cdc_ooo_profile output on the real corpus, replay idempotence,
  * and cross-batch state under RocksDB.
  */
object StreamingLateness {

  case class Ev(event_id: Long, key: Long, op_type: String, ts: Long)
  case class Late(key: Long, op_type: String, event_id: Long, late_ms: Long)

  /** maxTs/highWater use Long.MinValue as the "unseen" sentinel. */
  case class KeyState(maxTs: Long, highWater: Long)

  /** Apply one group-batch to the key's state, arrival-ordered.
    * Within a micro-batch the group iterator is unordered; event_id
    * IS the arrival (resume-token) order, so restore it. Nanos →
    * whole ms, matching the batch profile's integer div.
    */
  private[graft] def fold[E](key: Long, it: Iterator[E], st0: KeyState)(
      idOf: E => Long, tsOf: E => Long, opOf: E => String)
      : (KeyState, Vector[Late]) = {
    val sorted = it.toSeq.sortBy(idOf)
    var st = st0
    val out = Vector.newBuilder[Late]
    for (e <- sorted if idOf(e) > st.highWater) {
      if (st.maxTs != Long.MinValue && st.maxTs > tsOf(e)) {
        out += Late(key, opOf(e), idOf(e), (st.maxTs - tsOf(e)) / 1000000L)
      }
      st = KeyState(math.max(st.maxTs, tsOf(e)), idOf(e))
    }
    (st, out.result())
  }

  def observe(evs: Dataset[Ev]): Dataset[Late] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Ev], state: GroupState[KeyState]) =>
          val st0 = state.getOption
            .getOrElse(KeyState(Long.MinValue, Long.MinValue))
          val (st, out) = fold(key, it, st0)(_.event_id, _.ts, _.op_type)
          state.update(st)
          out.iterator
      }
  }

  /** [[Ev]] plus the event time as a Timestamp column for the
    * watermark ([[Ev.ts]] stays Long nanos — the lateness arithmetic
    * and batch parity are unchanged; `etime` only drives eviction).
    */
  case class TimedEv(event_id: Long, key: Long, op_type: String,
      ts: Long, etime: java.sql.Timestamp)

  /** [[observe]] with watermark-driven state eviction — the
    * production form: per-key state would otherwise grow with the
    * key space forever (the sibling StreamingNearDup/StreamingSemDedup
    * TTL discipline). A key idle past (its max event time + keyTtlMs)
    * by the watermark is evicted; a later arrival re-anchors, so an
    * inversion against the EVICTED max is no longer observable.
    *
    * `watermarkDelay` is the BINDING observability bound, tighter
    * than the TTL: Spark drops input rows older than the watermark
    * before they reach the operator, so an inversion deeper than
    * roughly the delay is never seen — the monitor reports
    * `late_ms ≲ delay`, not the true tail beyond it. Size the delay
    * ABOVE the lateness range being measured (it is this monitor's
    * measurement window, not the downstream pipeline's delay); the
    * default matches the TTL so neither bound silently undercuts the
    * other. For an unbounded view, [[observe]] has no watermark and
    * drops nothing — at the cost of unbounded keyed state.
    */
  def observeEventTime(
      evs: Dataset[TimedEv],
      keyTtlMs: Long = 3600L * 1000,
      watermarkDelay: String = "1 hour"): Dataset[Late] = {
    import evs.sparkSession.implicits._
    evs.withWatermark("etime", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[TimedEv], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st0 = state.getOption
              .getOrElse(KeyState(Long.MinValue, Long.MinValue))
            val (st, out) = fold(key, it, st0)(_.event_id, _.ts, _.op_type)
            state.update(st)
            // deadline in MS (state clock) from the nanos max; never
            // at/below the current watermark (Spark rejects it)
            val floor = state.getCurrentWatermarkMs() + 1
            if (st.maxTs != Long.MinValue)
              state.setTimeoutTimestamp(
                math.max(st.maxTs / 1000000L + keyTtlMs, floor))
            out.iterator
          }
      }
  }
}
