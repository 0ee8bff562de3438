package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming operators (SURVEY §2 "absent categories" that
  * the Spark engine supplies natively): tumbling/sliding windows with
  * watermarks, within-watermark dedup, and session windows. These are
  * the building blocks the CDC stream (or any event stream through
  * this engine) composes for time-based analytics with bounded state.
  *
  * State-size discipline for 100 TB streams: every operator here
  * requires a watermark, so Spark can evict window/dedup state; keys
  * are (window, low-cardinality dims) — state is proportional to
  * active windows, not stream length.
  */
object EventTimeOps {

  /** Tumbling (or sliding, if slide != width) windowed counts+sums. */
  def windowedAgg(
      events: DataFrame,
      timeCol: String,
      watermark: String,
      width: String,
      slide: Option[String] = None,
      keys: Seq[Column] = Seq.empty,
      aggs: Seq[Column] = Seq(count(lit(1)).alias("n"))): DataFrame = {
    val win = slide match {
      case Some(sl) => window(col(timeCol), width, sl)
      case None => window(col(timeCol), width)
    }
    events.withWatermark(timeCol, watermark)
      .groupBy(win +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Drop duplicate events by key within the watermark horizon —
    * bounded-state dedup for at-least-once upstream delivery (exactly
    * the duplicate profile the CDC pipeline's restart semantics
    * produce).
    */
  def dedupWithinWatermark(
      events: DataFrame,
      timeCol: String,
      watermark: String,
      keyCols: Seq[String]): DataFrame =
    events.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: pair left events with right events
    * of the same key whose time falls in [leftTime, leftTime + bound].
    * Both sides carry watermarks so join state is evicted — the
    * bounded-state form of stream-stream correlation (e.g. click →
    * purchase attribution on the CDC stream).
    *
    * Inputs must expose distinct column names; `leftKey`/`rightKey`
    * name the equi-pair and `leftTime`/`rightTime` the event-time
    * columns.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      watermark: String,
      bound: String): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(r,
      expr(s"$leftKey = $rightKey AND " +
        s"$rightTime >= $leftTime AND " +
        s"$rightTime <= $leftTime + interval $bound"))
  }

  /** LEFT OUTER stream-stream interval join: like [[intervalJoin]],
    * but left rows with no right match within the bound still emit —
    * with nulls — once the watermark passes the end of their match
    * interval and Spark can prove no future right row qualifies.
    * This is the attribution shape that must NOT silently drop the
    * unconverted majority (funnel denominators, abandoned-cart
    * reports): an inner join only ever shows the matches.
    *
    * State/correctness contract (why the time bound is mandatory):
    * without the interval condition Spark cannot evict left state or
    * decide when a row is conclusively unmatched, and rejects the
    * plan. With it, both sides' state is bounded by
    * watermark + bound, and null-emission lags the data by exactly
    * the watermark delay — the spec pins that a trailing
    * watermark-advancing batch is what flushes the unmatched rows.
    */
  def outerIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      watermark: String,
      bound: String): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(r,
      expr(s"$leftKey = $rightKey AND " +
        s"$rightTime >= $leftTime AND " +
        s"$rightTime <= $leftTime + interval $bound"),
      "leftOuter")
  }

  /** Stream-static enrichment: join the stream against a (small)
    * static dimension, broadcast so no stream-side state or shuffle
    * exists — the streaming analogue of the reference's
    * fullDocument=updateLookup server-side enrichment, and the way a
    * CDC stream picks up reference data (topic configs, tenant maps)
    * at scale. The static side re-resolves per micro-batch for file
    * sources, so slowly-changing dimensions refresh without restart.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String): DataFrame =
    stream.join(broadcast(dim),
      stream(streamKey) === dim(dimKey), "left")

  /** Session windows: activity grouped by gaps of `gap` inactivity. */
  def sessionAgg(
      events: DataFrame,
      timeCol: String,
      watermark: String,
      gap: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    events.withWatermark(timeCol, watermark)
      .groupBy(session_window(col(timeCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
}
