package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuously-maintained snapshot of the collection the change
  * stream describes — the streaming twin of the batch `cdc_apply`
  * query, and the natural terminal consumer of the reference's
  * pipeline (`change_event_handler.py:84-113` produces the envelope;
  * this folds envelopes back into current state).
  *
  * Last-writer-wins per documentKey by the stream's total order
  * (`eventId` — the reference's S6 sequence number): inserts/updates
  * overwrite, tombstones ('d') delete. Events at or below the key's
  * applied high-water mark are ignored, which makes redelivery
  * harmless — exactly the idempotence a resume-token replay
  * (`watch.py` resume_after) needs under at-least-once delivery.
  *
  * Scale shape:
  *  - one groupByKey on the documentKey — the same hash partitioning
  *    the snapshot table itself wants;
  *  - state is one row per LIVE key: a tombstone removes its key's
  *    state entirely, so deleted keys cost nothing forever after.
  *    The trade: state keeps no tombstone memory, so an event OLDER
  *    than a processed delete that arrives in a LATER batch
  *    resurrects the key (batch `cdc_apply` would not). Production
  *    hardening is watermark-bounded tombstone retention; the spec
  *    pins the documented behavior so the trade stays visible.
  *
  * Emission is one row per key per micro-batch in which the key
  * changed (Update-mode contract — a memory/file sink accumulates
  * history; consumers take the latest row per key, same contract as
  * `StreamingHeavyHitters.summaries`). Deletes emit `live = false`.
  */
object StreamingSnapshot {

  case class Change(key: Long, eventId: Long, op: String, doc: String,
    cents: Long)
  /** Post-batch state of a key that changed this batch. */
  case class SnapRow(key: Long, lastEventId: Long, op: String, doc: String,
    cents: Long, live: Boolean)
  case class Snap(lastEventId: Long, op: String, doc: String, cents: Long)

  def apply(changes: Dataset[Change]): Dataset[SnapRow] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Change], state: GroupState[Snap]) =>
          // apply in sequence order: within a batch, a late-arriving
          // older id can never clobber a newer one
          val sorted = it.toArray.sortBy(_.eventId)
          var cur = state.getOption
          var applied = false
          var lastId = cur.map(_.lastEventId).getOrElse(Long.MinValue)
          for (c <- sorted) {
            if (c.eventId > lastId) {
              applied = true
              lastId = c.eventId
              cur =
                if (c.op == "d") None
                else Some(Snap(c.eventId, c.op, c.doc, c.cents))
            }
          }
          if (!applied) Iterator.empty
          else cur match {
            case Some(s) =>
              state.update(s)
              Iterator.single(
                SnapRow(key, s.lastEventId, s.op, s.doc, s.cents, live = true))
            case None =>
              if (state.exists) state.remove()
              Iterator.single(
                SnapRow(key, lastId, "d", "", 0L, live = false))
          }
      }
  }
}
