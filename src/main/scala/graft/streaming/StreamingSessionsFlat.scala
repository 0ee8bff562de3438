package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Hand-rolled gap sessionization on `flatMapGroupsWithState` — the
  * r13 measured ALTERNATIVE to `StreamingSessions`' built-in
  * `session_window` twin, built because the built-in measured ~2×
  * slower than the hand-rolled fixed-width twins in r11 (PLANS.md
  * rate table: sessions 6.4k ev/s vs 12–30k for the fMGWS family)
  * and the r12 verdict asked for the comparison to be a measurement,
  * not a note.
  *
  * Semantics match the built-in twin's contract (and the batch
  * `s7_sessions` query) under the watermark discipline every twin
  * here assumes: events ≤ gap apart merge (diff > gap splits — the
  * batch rule), a session emits once the event-time watermark
  * strictly passes its gap-extended end (no event that could still
  * legally arrive can extend it), and state per user is the list of
  * still-open sessions — bounded by the active-user set exactly like
  * the engine's session store. Replay equality with the batch query
  * is pinned by `StreamingSessionsFlatSpec` on the real corpus.
  *
  * Why this can beat the engine's own operator: `session_window`
  * runs two state-store passes per batch (merge candidate sessions,
  * then evict closed ones) over a sort-based session store, paying
  * per-batch sort + store round-trips per TOUCHED USER; the fMGWS
  * loop does one state read + one write per touched user per batch
  * with the merge logic inlined on plain JVM objects. Same state
  * class, fewer store passes.
  *
  * Output schema = the built-in twin's: (user_id, start_ms, end_ms,
  * n_events), append-only closed sessions.
  */
object StreamingSessionsFlat {

  import StreamingSessions.Ev

  case class Sess(startMs: Long, endMs: Long, n: Long)
  case class OpenSessions(open: Seq[Sess])
  case class SessOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)
  /** event + its watermark-bearing timestamp column */
  case class EvT(userId: Long, tMs: Long, ts: java.sql.Timestamp)

  /** @param gapMs       session gap (batch parity: SessionGapMs)
    * @param watermarkMs allowed event-time lateness before a session
    *                     can close
    */
  def track(events: Dataset[Ev], gapMs: Long,
      watermarkMs: Long = 0L): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_millis(org.apache.spark.sql.functions.col("tMs")))
      .withWatermark("ts", s"$watermarkMs milliseconds")
      .select("userId", "tMs", "ts").as[EvT]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvT],
         state: GroupState[OpenSessions]) =>
          val wm = state.getCurrentWatermarkMs()
          // merge this batch's events into the open-session list:
          // sort, then fold — an event within gap of the last open
          // session extends it, else opens a new one
          var open = state.getOption.map(_.open.toVector)
            .getOrElse(Vector.empty)
          if (it.nonEmpty) {
            // one start-ordered merge pass over (existing open
            // sessions ++ this batch's events as 1-event sessions):
            // an item starting within gap of the running session's
            // end extends it, else the running session is replaced.
            // Merging is associative over the start order, so this
            // reproduces the batch split-on-diff>gap rule exactly.
            val items = (open ++ it.map(e => Sess(e.tMs, e.tMs, 1L)))
              .sortBy(s => (s.startMs, s.endMs)).toArray
            val out = Vector.newBuilder[Sess]
            var cur = items(0)
            var i = 1
            while (i < items.length) {
              val s = items(i)
              if (s.startMs - cur.endMs <= gapMs)
                cur = Sess(cur.startMs, math.max(cur.endMs, s.endMs),
                  cur.n + s.n)
              else { out += cur; cur = s }
              i += 1
            }
            out += cur
            open = out.result()
          }
          // emit every session no legal event can still extend:
          // end + gap strictly below the watermark
          val (closed, stillOpen) = open.partition(_.endMs + gapMs < wm)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(OpenSessions(stillOpen))
            // fire when the watermark passes the earliest close point
            // (must be strictly above the current watermark)
            val at = stillOpen.map(_.endMs + gapMs).min
            state.setTimeoutTimestamp(math.max(at, wm + 1L))
          }
          closed.iterator.map(s => SessOut(uid, s.startMs, s.endMs, s.n))
      }
  }
}
