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

  def observe(evs: Dataset[Ev]): Dataset[Late] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Ev], state: GroupState[KeyState]) =>
          // within a micro-batch the group iterator is unordered;
          // event_id IS the arrival (resume-token) order, so restore it
          val sorted = it.toArray.sortBy(_.event_id)
          var st = state.getOption
            .getOrElse(KeyState(Long.MinValue, Long.MinValue))
          val out = Vector.newBuilder[Late]
          for (e <- sorted if e.event_id > st.highWater) {
            if (st.maxTs != Long.MinValue && st.maxTs > e.ts) {
              // nanos → whole ms, matching the batch profile's integer div
              out += Late(key, e.op_type, e.event_id,
                (st.maxTs - e.ts) / 1000000L)
            }
            st = KeyState(math.max(st.maxTs, e.ts), e.event_id)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
