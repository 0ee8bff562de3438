package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incrementally-maintained aggregate over the current snapshot — the
  * streaming twin of the batch `cdc_delta_agg` query, and the most
  * common downstream consumer of the reference's Kafka topics: the
  * envelopes `producing/change_event_handler.py:100-113` emits exist
  * precisely so a consumer can keep "sum/count of the live collection,
  * by bucket" current without ever re-scanning history.
  *
  * Two chained operators, each with the state it minimally needs:
  *
  *  1. `deltas` — flatMapGroupsWithState keyed on the documentKey.
  *     State per key: (applied high-water mark, live?, current value).
  *     Each micro-batch folds the key's new events in sequence order
  *     and emits ONE delta row (Δcount, Δsum for the key's bucket) —
  *     the difference between the key's contribution before and after
  *     the batch. Events at or below the high-water mark contribute
  *     nothing, which makes resume-token redelivery (at-least-once,
  *     `watch.py` resume_after) emit no delta at all.
  *  2. a streaming groupBy(bucket).sum over the delta rows — Spark's
  *     own aggregation state accumulates the running totals, so the
  *     bucket row IS the maintained view (Update-mode contract:
  *     consumers take the latest row per bucket).
  *
  * Scale shape: operator 1 shuffles on the documentKey (the same hash
  * partitioning the snapshot wants; state is one small fixed-width row
  * per key), operator 2 shuffles O(changed buckets) rows per batch —
  * nothing event-history-sized is ever held or re-read. Unlike
  * `StreamingSnapshot` (which removes a deleted key's state entirely),
  * tombstones here RETAIN the high-water mark: a delta that double-
  * applies on redelivery would silently corrupt the running totals,
  * so idempotence outranks the live-keys-only state bound. Production
  * hardening for unbounded deleted-key churn is a state TTL
  * (GroupStateTimeout) that expires tombstones past the redelivery
  * horizon; the spec pins the retained-tombstone behavior so the
  * trade stays visible.
  */
object StreamingDeltaAgg {

  case class Change(key: Long, eventId: Long, op: String, cents: Long)
  /** Per-key durable state: applied high-water mark + current value. */
  case class KeyState(lastEventId: Long, live: Boolean, cents: Long)
  /** One batch's net change from one key, addressed to its bucket. */
  case class Delta(bucket: Long, dn: Long, dc: Long)

  /** Stage 1: per-key delta emission (Append — each delta row is final
    * the moment it is emitted; only the downstream sums revise).
    */
  def deltas(changes: Dataset[Change], buckets: Int = 16): Dataset[Delta] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Change], state: GroupState[KeyState]) =>
          // fold in sequence order: a late-arriving older id within the
          // batch can never clobber a newer one
          val sorted = it.toArray.sortBy(_.eventId)
          val prior = state.getOption
          var lastId = prior.map(_.lastEventId).getOrElse(Long.MinValue)
          var live = prior.exists(_.live)
          var cents = prior.filter(_.live).map(_.cents).getOrElse(0L)
          val n0 = if (live) 1L else 0L
          val c0 = if (live) cents else 0L
          var applied = false
          for (c <- sorted if c.eventId > lastId) {
            applied = true
            lastId = c.eventId
            if (c.op == "d") { live = false; cents = 0L }
            else { live = true; cents = c.cents }
          }
          if (!applied) Iterator.empty
          else {
            state.update(KeyState(lastId, live, cents))
            val n1 = if (live) 1L else 0L
            val c1 = if (live) cents else 0L
            // value-neutral updates (same cents re-written) move nothing
            if (n1 == n0 && c1 == c0) Iterator.empty
            else Iterator.single(Delta(key % buckets, n1 - n0, c1 - c0))
          }
      }
  }

  /** The maintained view: running (n_users, sum_cents) per bucket.
    * Columns match batch `cdc_delta_agg` so the spec can diff directly.
    */
  def apply(changes: Dataset[Change], buckets: Int = 16): DataFrame =
    deltas(changes, buckets)
      .groupBy("bucket")
      .agg(sum(col("dn")).alias("n_users"), sum(col("dc")).alias("sum_cents"))
}
