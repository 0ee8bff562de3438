package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous point-in-time enrichment — the streaming twin of the
  * batch `cdc_asof_state` query: every purchase event is annotated,
  * the moment it arrives, with the user's LAST state change strictly
  * before it (the no-feature-leakage as-of join, evaluated online).
  * This is how a feature pipeline serves training-consistent features
  * from the change stream: the batch query and this operator produce
  * bit-identical rows on ordered replay (`StreamingAsofStateSpec`),
  * so features computed online match features recomputed offline.
  *
  * State per user is ONE row — the latest state change (id, op,
  * cents) plus an applied high-water mark — the information-theoretic
  * minimum for as-of correctness and the cheapest stateful class
  * here: O(live keys), independent of stream length. Events at or
  * below the high-water mark emit nothing and mutate nothing, so
  * at-least-once redelivery of an ordered replay is verdict-stable.
  *
  * Emission is Append: one immutable enriched row per NEW purchase;
  * state changes ('u'/'d'/signup) emit nothing and only advance the
  * carried state. Out-of-order arrival takes the arrival-order
  * as-of (Append cannot retract); the batch query remains the
  * event-time-correct reference, the same contract as
  * StreamingGrowth.
  */
object StreamingAsofState {

  case class Ev(event_id: Long, user_id: Long, op: String, cents: Long)
  case class Enriched(event_id: Long, user_id: Long, cents: Long,
    state_id: Long, state_op: String, state_cents: Long)
  case class UserState(sid: Long, sop: String, scents: Long, maxSeen: Long)

  def enrich(evs: Dataset[Ev]): Dataset[Enriched] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[UserState]) =>
          // event_id is the stream's total order: apply in-batch
          // arrivals oldest-first so a state change and a later
          // purchase in the same micro-batch enrich correctly
          val sorted = it.toArray.sortBy(_.event_id)
          var st = state.getOption
            .getOrElse(UserState(-1L, "none", 0L, Long.MinValue))
          val out = Vector.newBuilder[Enriched]
          for (e <- sorted if e.event_id > st.maxSeen) {
            if (e.op == "c")
              out += Enriched(e.event_id, uid, e.cents,
                st.sid, st.sop, st.scents)
            else
              st = st.copy(sid = e.event_id, sop = e.op, scents = e.cents)
            st = st.copy(maxSeen = e.event_id)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
