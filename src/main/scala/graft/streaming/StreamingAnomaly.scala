package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online z-score outlier detection — the streaming twin of the batch
  * `rel_anomaly` gate, for flagging anomalous values at ingest
  * (payment spikes, corrupt metrics, runaway counters) without a
  * corpus-wide stats pass.
  *
  * Shape: values group by key (event type / metric name); each key
  * keeps exact integer running moments `(n, Σx, Σx²)` — three longs
  * per key FOREVER, independent of stream length: the bounded-state
  * discipline a 100 TB/day stream needs. Arrivals in a micro-batch
  * are scored against the moments as of the END of the PREVIOUS
  * batch (then the batch is folded in), so a flood of outliers in
  * one batch cannot drag the mean toward itself before being judged,
  * and scoring is independent of intra-batch order.
  *
  * Cold start: nothing is flagged for a key until `minN`
  * observations have accumulated — a z-score against a 3-sample mean
  * is noise, and the gate must not spray false positives while the
  * baseline forms.
  *
  * The only shuffle is groupByKey on the metric key; per-key moments
  * merge downstream by summing — the same associativity the batch
  * aggregate exploits.
  */
object StreamingAnomaly {

  case class Obs(obsId: Long, key: String, value: Long)

  case class Anomaly(obsId: Long, key: String, value: Long, z: Double)

  /** Exact integer running moments. Public + flat for the state
    * encoder (same constraint as StreamingHeavyHitters.MgState).
    */
  case class Moments(n: Long, sum: Long, sumsq: Long)

  /** Pure scoring core (spec-exercised directly): z of `value`
    * against `m`, or None below `minN` / at zero variance.
    */
  private[streaming] def zOf(m: Moments, value: Long, minN: Long)
      : Option[Double] = {
    if (m.n < minN) None
    else {
      val mean = m.sum.toDouble / m.n
      val variance = m.sumsq.toDouble / m.n - mean * mean
      if (variance <= 0) None
      else Some((value.toDouble - mean) / math.sqrt(variance))
    }
  }

  /** observations → flagged anomalies (Append mode: only outliers are
    * emitted, so the sink stays as sparse as the anomalies are).
    * `idleTtl` reclaims state for retired keys; `None` disables
    * timeouts so tests' processAllAvailable quiesces.
    */
  def detect(
      obs: Dataset[Obs],
      zThresh: Double = 3.0,
      minN: Long = 50,
      idleTtl: Option[String] = None): Dataset[Anomaly] = {
    import obs.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        updateKey(zThresh, minN, idleTtl))
  }

  private def updateKey(zThresh: Double, minN: Long,
      idleTtl: Option[String])(
      key: String,
      rows: Iterator[Obs],
      state: GroupState[Moments]): Iterator[Anomaly] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val prev = state.getOption.getOrElse(Moments(0L, 0L, 0L))
      val batch = rows.toVector
      val out = batch.flatMap { o =>
        zOf(prev, o.value, minN).filter(z => math.abs(z) > zThresh)
          .map(z => Anomaly(o.obsId, key, o.value, z))
      }
      state.update(Moments(
        prev.n + batch.size,
        prev.sum + batch.iterator.map(_.value).sum,
        prev.sumsq + batch.iterator.map(o => o.value * o.value).sum))
      idleTtl.foreach(state.setTimeoutDuration)
      out.iterator
    }
  }
}
