package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The growth curve maintained from the stream — the streaming twin
  * of the batch `rel_cum_distinct` query (exact distinct users, no
  * sketches): per hour, how many users were seen for the FIRST time.
  *
  * Two chained operators:
  *
  *  1. `firstTouch` — flatMapGroupsWithState keyed on the user. State
  *     per key: one boolean (seen). A user's first arriving event
  *     emits exactly one (user, hour) row; every later event — and
  *     every at-least-once REDELIVERY of the first — emits nothing.
  *     This is the streaming form of the batch min-agg: under ordered
  *     replay (the reference's delivery order after a resume) the
  *     first-arriving event IS the min-hour event, so the twin equals
  *     the batch query exactly. Under out-of-order arrival the twin
  *     keeps the first-ARRIVAL hour (Append mode cannot retract an
  *     emitted row); the spec pins both the ordered-replay equality
  *     and this documented divergence.
  *  2. a streaming groupBy(hour).count over the emissions — Spark's
  *     aggregation state holds the per-hour running counts
  *     (Update-mode contract: latest row per hour wins). The
  *     cumulative curve is a prefix sum over the hour-cardinality
  *     result — consumer-side arithmetic, same as batch.
  *
  * Scale shape: operator 1 shuffles on the user key and holds ONE
  * BOOLEAN per distinct user — the information-theoretic minimum for
  * exact distinct counting (the reason the batch query exists is that
  * this state never has to be held per HOUR; it is one global set).
  * Operator 2's state is O(hours). For tolerable-error deployments a
  * drop-in variant is approx_count_distinct over (hour, user) with
  * watermarked eviction; this twin is the exact path.
  */
object StreamingGrowth {

  case class Hit(user: Long, hour: Long)
  case class NewUser(user: Long, hour: Long)

  /** Stage 1: exactly-one emission per user (Append). */
  def firstTouch(hits: Dataset[Hit]): Dataset[NewUser] = {
    import hits.sparkSession.implicits._
    hits.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Hit], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // first arrival in this batch: the minimum hour among the
            // batch's own rows (within one batch we CAN see all rows,
            // so intra-batch disorder costs nothing)
            Iterator.single(NewUser(user, it.map(_.hour).min))
          }
      }
  }

  /** The maintained view: running new-user count per hour. */
  def apply(hits: Dataset[Hit]): DataFrame =
    firstTouch(hits)
      .groupBy(col("hour"))
      .agg(count(lit(1)).alias("new_users"))
}
