package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sequence-gap alerting at ingest — the streaming twin of the batch
  * `cdc_gap_detect` scan, and the live form of the property the
  * reference's commit protocol enforces (`committing/commit_flow.py`
  * advances the watermark only over a CONTIGUOUS prefix of sequence
  * numbers; a hole means a producer lost an event). The batch query
  * finds holes after the fact; this operator raises them the moment
  * the stream steps over one: per topic, state is the applied
  * high-water id, and an arriving id that jumps past high-water + 1
  * emits the missed range immediately.
  *
  * State per topic is ONE long — the cheapest possible state class —
  * because the reference's delivery order makes ids per topic
  * non-decreasing (resume-token replay restarts BEHIND the
  * high-water, never ahead). Redelivered ids at or below high-water
  * emit nothing, so at-least-once replay cannot re-alert a gap. The
  * first id of a topic anchors the sequence and emits nothing (the
  * stream cannot know what preceded it).
  *
  * Emission is Append: one immutable (from_id, to_id, width) range
  * per hole — the alert feed an operator pages on, and the exact
  * complement of what the commit watermark will refuse to cross.
  * StreamingGapDetectSpec pins range-set equality with the batch
  * cdc_gap_detect output on the real corpus.
  */
object StreamingGapDetect {

  case class Ev(event_id: Long, topic: String)
  case class Gap(topic: String, from_id: Long, to_id: Long, width: Long)
  case class GapState(highWater: Long)

  def detect(evs: Dataset[Ev]): Dataset[Gap] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.topic)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (topic: String, it: Iterator[Ev], state: GroupState[GapState]) =>
          val sorted = it.toArray.sortBy(_.event_id)
          var st = state.getOption.getOrElse(GapState(Long.MinValue))
          val out = Vector.newBuilder[Gap]
          for (e <- sorted if e.event_id > st.highWater) {
            if (st.highWater != Long.MinValue &&
                e.event_id > st.highWater + 1L) {
              out += Gap(topic, st.highWater + 1L, e.event_id - 1L,
                e.event_id - st.highWater - 1L)
            }
            st = GapState(e.event_id)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
