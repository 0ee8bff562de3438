package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SCD type-2 history maintained AT INGEST — the streaming twin of the
  * batch `cdc_scd2` query (`queries/CdcQueries.scala`), and the last
  * CDC materialization that lacked one (`cdc_apply`→StreamingSnapshot,
  * `cdc_delta_agg`→StreamingDeltaAgg landed earlier). The envelopes
  * the reference emits (`producing/change_event_handler.py:100-113` —
  * documentKey, op, after-document) feed exactly this consumer shape:
  * a warehouse history table where each change opens a validity
  * interval and the key's NEXT change closes it.
  *
  * A validity interval closes exactly when the next event for the key
  * arrives, so the operator is flatMapGroupsWithState keyed on the
  * documentKey with ONE open row per key as state: each arriving
  * change (folded in sequence order) emits the predecessor as a
  * CLOSED row `[valid_from, valid_to)` and becomes the new open row.
  * Append output mode is exact — a closed interval is immutable the
  * moment it is emitted; the open row lives only in state until its
  * successor arrives (batch parity: the batch rows with
  * `valid_to IS NULL` are precisely the final open-row states).
  *
  * At-least-once redelivery is absorbed by construction: the open
  * row's valid_from IS the key's applied high-water mark (every
  * applied event becomes the open row), so a redelivered or stale
  * event — eventId ≤ open.validFrom — emits nothing and moves
  * nothing. Deletes open an interval like any other op (the batch
  * query keeps 'd' rows as history), so state is one fixed-width row
  * per key that ever changed — the natural SCD2 state bound, since
  * the table itself is per-key history.
  *
  * Scale shape: one shuffle on the documentKey (the same hash
  * partitioning the history table wants), state one row per key,
  * emissions O(changes). Proven under RocksDB in the spec.
  */
object StreamingScd2 {

  /** One change-stream event (the envelope's key/op/value projection,
    * eventId = the total-order sequence number).
    */
  case class Change(key: Long, eventId: Long, op: String, cents: Long)

  /** Per-key durable state: the key's current OPEN version. validFrom
    * doubles as the applied high-water mark.
    */
  case class OpenVersion(validFrom: Long, op: String, cents: Long)

  /** A closed history row: `[valid_from, valid_to)`, matching the
    * batch cdc_scd2 columns (whose open rows carry NULL valid_to and
    * here remain in state instead).
    */
  case class Version(user_id: Long, valid_from: Long, op: String,
    cents: Long, valid_to: Long)

  def apply(changes: Dataset[Change]): Dataset[Version] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Change], state: GroupState[OpenVersion]) =>
          // fold in sequence order so an in-batch older id can never
          // close a newer version backwards
          val sorted = it.toArray.sortBy(_.eventId)
          var open = state.getOption
          val closed = Seq.newBuilder[Version]
          for (c <- sorted if open.forall(_.validFrom < c.eventId)) {
            open.foreach { o =>
              closed += Version(key, o.validFrom, o.op, o.cents, c.eventId)
            }
            open = Some(OpenVersion(c.eventId, c.op, c.cents))
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
