package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous conversion-funnel tracking — the streaming twin of the
  * batch `rel_funnel` query: signup → click → purchase with each
  * stage inside a fixed window of the previous one, detected at
  * ingest instead of by a nightly batch pass.
  *
  * Semantics (identical to the batch query when per-user arrivals are
  * in event-time order): the funnel anchors on the user's FIRST
  * signup; the click stage takes the first click in
  * [t_signup, t_signup + window]; the purchase stage the first
  * purchase in [t_click, t_click + window]. Events of a stage whose
  * predecessor hasn't happened (or outside its window) are ignored —
  * including clicks BEFORE signup, which is what makes the funnel
  * ordered.
  *
  * State discipline: three optional longs per user FOREVER (the stage
  * timestamps) — bounded by the user population like
  * StreamingSnapshot, not by stream length. Redelivered events are
  * no-ops (a stage only ever sets once), so at-least-once delivery
  * upstream cannot double-advance a funnel. Intra-batch order
  * doesn't matter: each micro-batch's group is folded in event-time
  * order.
  *
  * Emission contract (Append mode, like StreamingHeavyHitters
  * .summaries): a user's CURRENT funnel row is re-emitted whenever a
  * stage advances; consumers reduce to the latest row per user
  * (latest-row-wins). `idleTtl` optionally reclaims state for
  * retired users.
  */
object StreamingFunnel {

  case class Ev(userId: Long, eventType: String, t: Long)

  /** Public + flat for the state encoder. -1 = stage not reached. */
  case class FunnelState(tSignup: Long, tClick: Long, tPurchase: Long)

  case class FunnelRow(userId: Long, tSignup: Long, tClick: Long,
      tPurchase: Long, reachedClick: Boolean, reachedPurchase: Boolean)

  private[streaming] def stageRank(eventType: String): Int =
    eventType match {
      case "signup" => 0
      case "click" => 1
      case "purchase" => 2
      case _ => 3
    }

  /** Stage-advance fold, spec-exercised directly: returns the state
    * after applying one event.
    */
  private[streaming] def advance(st: FunnelState, e: Ev, windowUs: Long)
      : FunnelState = e.eventType match {
    case "signup" if st.tSignup < 0 =>
      st.copy(tSignup = e.t)
    case "click" if st.tSignup >= 0 && st.tClick < 0 &&
        e.t >= st.tSignup && e.t <= st.tSignup + windowUs =>
      st.copy(tClick = e.t)
    case "purchase" if st.tClick >= 0 && st.tPurchase < 0 &&
        e.t >= st.tClick && e.t <= st.tClick + windowUs =>
      st.copy(tPurchase = e.t)
    case _ => st
  }

  def track(
      events: Dataset[Ev],
      windowUs: Long,
      idleTtl: Option[String] = None): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        updateUser(windowUs, idleTtl))
  }

  private def updateUser(windowUs: Long, idleTtl: Option[String])(
      userId: Long,
      rows: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val st0 = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
    // event-time order within the batch (stage rank breaks timestamp
    // ties: a click at exactly t_signup qualifies in the batch query,
    // so the signup must fold first): intra-batch arrival order must
    // not decide which click anchors the purchase window
    val st1 = rows.toSeq.sortBy(e => (e.t, stageRank(e.eventType)))
      .foldLeft(st0)((st, e) => advance(st, e, windowUs))
    idleTtl.foreach(state.setTimeoutDuration)
    if (st1 == st0) Iterator.empty
    else {
      state.update(st1)
      Iterator.single(FunnelRow(userId, st1.tSignup, st1.tClick,
        st1.tPurchase, st1.tClick >= 0, st1.tPurchase >= 0))
    }
  }
}
