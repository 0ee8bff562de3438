package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.cdc.{ChangeEventRow, EnvelopeTransform, Ns, ResumeToken, UpdateDescription}
import graft.sources.ChangeEventReplaySource

/** Streaming-runtime envelope throughput: the reference-comparable
  * headline (`change_handler.py` + `change_event_handler.py` events/s)
  * measured on the ACTUAL Structured Streaming path — replay source →
  * EnvelopeTransform → noop streaming sink — rather than derived from
  * the batch `p1_cdc_envelope` time. Micro-batch scheduling overhead
  * is part of the number, as it would be in production.
  */
object BenchStreaming {

  /** Wall-clock budget for the post-sweep streaming block: passes
    * check `exhausted` before starting and shrink their watchdog cap
    * to what remains, so a slow or stuck state-store provider skips
    * remaining passes instead of blowing past SPARK_GRAFT_BUDGET_SEC
    * (the reserve used to assume ~90 s for what is worst-case many
    * minutes of per-pass caps).
    */
  final class WallBudget(totalSec: Long) {
    private val t0 = System.nanoTime()
    def remainingSec: Long = totalSec - ((System.nanoTime() - t0) / 1e9).toLong
    def exhausted: Boolean = remainingSec <= 0
  }

  /** No-deadline budget for ad-hoc callers. */
  def unbounded: WallBudget = new WallBudget(Long.MaxValue / 4)

  /** Ad-hoc: `runMain graft.BenchStreaming [nEvents]`. */
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val eps = args.headOption match {
      case Some(n) => envelopeEventsPerSec(spark, n.toInt)
      case None => envelopeEventsPerSec(spark)
    }
    println(s"""{"streaming_envelope_events_per_sec":$eps}""")
    spark.stop()
  }

  /** A synthetic stream of data-op events cycling insert/update/
    * replace/delete with distinct ObjectId keys — every envelope
    * branch (before / updateDescription / after) exercised.
    */
  private[graft] def syntheticEvents(n: Int): IndexedSeq[ChangeEventRow] = {
    val ns = Ns("bench-db", "BenchCollection")
    val ops = Array("insert", "update", "replace", "delete")
    (0 until n).map { i =>
      val oid = f"$i%024x"
      val key = s"""{"_id": {"$$oid": "$oid"}}"""
      val doc = s"""{"_id": {"$$oid": "$oid"}, "a": $i, "pad": "xxxxxxxxxxxxxxxx"}"""
      val prev = s"""{"_id": {"$$oid": "$oid"}, "a": ${i - 1}, "pad": "xxxxxxxxxxxxxxxx"}"""
      val op = ops(i % 4)
      ChangeEventRow(
        ResumeToken(f"82BENCH$i%016X"), op,
        new Timestamp(1720890531000L + i), new Timestamp(1720890531000L + i),
        ns, Some(key),
        if (op == "delete") None else Some(doc),
        if (op == "insert") None else Some(prev),
        if (op == "update")
          Some(UpdateDescription(s"""{"a": $i}""", Seq.empty, Seq.empty))
        else None)
    }
  }

  /** One full pass of the streaming envelope over the fixture;
    * returns events/second (events ÷ wall), or -1 on failure/stall.
    * Bounded by `capSec` via query stop, so a contention burst can't
    * hang the bench past its reserve.
    */
  private def onePass(
      spark: SparkSession,
      opts: Map[String, String],
      n: Int,
      capSec: Long): Long = {
    val ckpt = java.nio.file.Files.createTempDirectory("bench_stream_ckpt")
    try {
      val events = spark.readStream.format("graft-replay")
        .options(opts)
        .option("maxRowsPerBatch", "50000")
        .option("partitions", spark.sparkContext.defaultParallelism.toString)
        .load()
      val q = EnvelopeTransform(events, topicPrefix = "bench").writeStream
        .format("noop")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.ProcessingTime(0L))
        .start()
      @volatile var capped = false
      val watchdog = new Thread(() => {
        try {
          Thread.sleep(capSec * 1000L)
          capped = true
          q.stop()
        } catch { case _: InterruptedException => () }
      })
      watchdog.setDaemon(true)
      watchdog.start()
      val t0 = System.nanoTime()
      try {
        q.processAllAvailable()
        val wallSec = (System.nanoTime() - t0) / 1e9
        q.stop()
        if (capped) {
          // partial run: count what actually flowed, still events/wall
          val processed = q.recentProgress.map(_.numInputRows).sum
          if (processed > 0) (processed / wallSec).round else -1L
        } else (n / wallSec).round
      } finally watchdog.interrupt()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] streaming envelope failed: ${e.getMessage}")
        -1L
    } finally {
      // best-effort temp cleanup
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
  }

  /** Steady-state streaming throughput: a warm-up pass pays the
    * one-time costs (fixture conversion into the source's row cache,
    * streaming codegen); the measured passes replay cached rows
    * through fresh checkpoints. Best of three is reported (each pass
    * is a valid sample and costs ~2 s — a single host-contention
    * burst spanning one pass can no longer halve the headline, as it
    * did between the r4 local runs: 210k vs 122k events/s from
    * identical code).
    */
  /** Best-of-3 policy shared by every streaming figure: pass 0
    * always runs (every figure needs >= 1 sample); later passes only
    * with budget left; each pass's watchdog cap is clamped to
    * [floorSec, capMax] of the remaining budget. The floor must sit
    * comfortably ABOVE the metric's nominal runtime — a cap below it
    * kills passes mid-flight on a healthy system and ships a
    * truncated sample (the corrupted-figure class this file exists
    * to prevent).
    */
  private def bestOf(budget: WallBudget, floorSec: Long, capMax: Long)(
      pass: Long => Long): Long = {
    var best = -1L
    var p = 0
    while (p < 3 && (p == 0 || !budget.exhausted)) {
      val cap = math.max(floorSec, math.min(capMax, budget.remainingSec))
      best = math.max(best, pass(cap))
      p += 1
    }
    best
  }

  def envelopeEventsPerSec(
      spark: SparkSession,
      n: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "300000").toInt,
      capSec: Long = 60L,
      budget: WallBudget = unbounded): Long = {
    val fixture = s"bench-stream-${System.nanoTime()}"
    val opts = ChangeEventReplaySource.register(fixture, syntheticEvents(n))
    try bestOf(budget, 15L, capSec)(cap => onePass(spark, opts, n, cap))
    finally ChangeEventReplaySource.unregister(fixture)
  }

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Run `f` with the given state-store provider (None = Spark's
    * default HDFS-backed heap provider), restoring the prior setting.
    */
  private def withProvider[A](spark: SparkSession,
      provider: Option[String])(f: => A): A = {
    val prior = spark.conf.getOption(ProviderKey)
    provider match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
    try f
    finally prior match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  /** The envelope passes with the RocksDB provider configured — the
    * 100-TB state-store configuration. The envelope path is STATELESS
    * (filter + projection, no keyed state), so no store is ever
    * instantiated and the figure must track the default-store number;
    * reporting it pins that configuring RocksDB costs the stateless
    * plane nothing. The state-store-BOUND comparison is
    * [[snapshotEventsPerSec]].
    */
  def envelopeEventsPerSecRocksDb(
      spark: SparkSession,
      n: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "300000").toInt,
      capSec: Long = 60L,
      budget: WallBudget = unbounded): Long =
    withProvider(spark, Some(RocksDb))(
      envelopeEventsPerSec(spark, n, capSec, budget))

  /** The two figures must agree within this factor — the envelope
    * path is stateless, so any larger gap is a measurement artifact
    * (host contention), never a real provider cost.
    */
  private[graft] val StatelessAgreeRatio = 1.5

  private[graft] def disagree(a: Long, b: Long): Boolean =
    a > 0 && b > 0 &&
      math.max(a, b).toDouble / math.min(a, b) > StatelessAgreeRatio

  /** BOTH stateless envelope figures (default store, RocksDB) with
    * the must-agree invariant ENFORCED, not just reported: the
    * envelope path instantiates no state store, so the two numbers
    * measure the same code and must track each other. When they
    * disagree by more than [[StatelessAgreeRatio]], the LOWER side is
    * re-measured (another best-of-3) up to 3 times — the r8 artifact
    * shipped an 82k default-store sample against 195k RocksDB because
    * the dual-reporting design caught the contention-corrupted sample
    * but nothing acted on the catch. The synthetic fixture is built
    * and registered ONCE for the whole pair (retries reuse the warm
    * source row cache instead of paying a cold rebuild under the very
    * time pressure that triggered the retry). Returns
    * (default, rocksdb, agreed) — `agreed = false` marks a pair that
    * STILL disagrees after the retries (sustained contention window;
    * the lower figure is corrupted), and the caller persists the flag
    * in the artifact so a reader never mistakes a failed-agreement
    * pair for a measured one.
    */
  def envelopeFigurePair(
      spark: SparkSession,
      n: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "300000").toInt,
      capSec: Long = 60L,
      budget: WallBudget = unbounded): (Long, Long, Boolean) = {
    val fixture = s"bench-stream-${System.nanoTime()}"
    val opts = ChangeEventReplaySource.register(fixture, syntheticEvents(n))
    try {
      def dfltRun(): Long =
        bestOf(budget, 15L, capSec)(cap => onePass(spark, opts, n, cap))
      def rocksRun(): Long = withProvider(spark, Some(RocksDb))(dfltRun())
      var dflt = dfltRun()
      var rocks = rocksRun()
      var retries = 0
      while (retries < 3 && disagree(dflt, rocks) && !budget.exhausted) {
        System.err.println(s"[bench] stateless envelope figures disagree " +
          s"($dflt vs $rocks ev/s) — re-measuring the lower side")
        if (dflt < rocks) dflt = math.max(dflt, dfltRun())
        else rocks = math.max(rocks, rocksRun())
        retries += 1
      }
      if (disagree(dflt, rocks))
        System.err.println(s"[bench] stateless envelope figures STILL " +
          s"disagree after $retries re-measures ($dflt vs $rocks ev/s) — " +
          "sustained contention window; treat the lower figure as corrupted")
      (dflt, rocks, !disagree(dflt, rocks))
    } finally ChangeEventReplaySource.unregister(fixture)
  }

  /** Stateful streaming throughput: the StreamingSnapshot upsert
    * (flatMapGroupsWithState, one state row per live key — the
    * terminal CDC consumer and the op where the state store IS the
    * cost: every micro-batch loads, mutates, and commits keyed
    * state). n synthetic changes over nKeys keys across `batches`
    * micro-batches, so cross-batch state load/commit — the part the
    * provider choice actually changes — is inside the measured
    * window. Returns events/s, or -1 on failure.
    */
  def snapshotEventsPerSec(
      spark: SparkSession,
      provider: Option[String],
      n: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "300000").toInt / 2,
      nKeys: Int = 50000,
      batches: Int = 10,
      capSec: Long = 90L): Long = withProvider(spark, provider) {
    import spark.implicits._
    import graft.streaming.StreamingSnapshot
    import graft.streaming.StreamingSnapshot.Change
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("bench_snap_ckpt")
    try {
      val in =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Change]
      val q = StreamingSnapshot(in.toDS()).writeStream
        .format("noop")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("update")
        .trigger(Trigger.ProcessingTime(0L))
        .start()
      val perBatch = math.max(1, n / batches)
      // pre-build every batch OUTSIDE the measured window: per-batch
      // Seq construction + string formatting for ~15k rows is
      // driver-side synthetic-data cost, and timing it dilutes the
      // default-vs-RocksDB state-store comparison this metric exists
      // to expose
      val batchData: IndexedSeq[IndexedSeq[Change]] =
        (0 until batches).map { b =>
          (0 until perBatch).map { j =>
            val id = b.toLong * perBatch + j
            Change(key = id % nKeys, eventId = id,
              op = if (id % 10 == 9) "d" else "u",
              doc = s"""{"a": $id}""", cents = id)
          }
        }
      // the watchdog guards the STREAMING QUERY, so it arms after the
      // un-timed data pre-build — otherwise driver-side construction
      // eats into the cap and a healthy pass can be killed at b=0
      @volatile var capped = false
      val watchdog = new Thread(() => {
        try {
          Thread.sleep(capSec * 1000L)
          capped = true
          q.stop()
        } catch { case _: InterruptedException => () }
      })
      watchdog.setDaemon(true)
      watchdog.start()
      val t0 = System.nanoTime()
      try {
        var b = 0
        var lastDone = t0
        while (b < batches && !capped) {
          in.addData(batchData(b))
          q.processAllAvailable()
          // wall is measured to the last COMPLETED batch: a watchdog
          // kill mid-batch must not leave the partial batch's time in
          // the denominator while its events are missing from the
          // numerator (an understated rate — the truncated-sample
          // class the envelope pair logic guards against)
          lastDone = System.nanoTime()
          b += 1
        }
        val wallSec = (lastDone - t0) / 1e9
        q.stop()
        val processed = b.toLong * perBatch
        if (processed > 0 && wallSec > 0) (processed / wallSec).round
        else -1L
      } finally watchdog.interrupt()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] streaming snapshot failed: ${e.getMessage}")
        -1L
    } finally {
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
  }

  /** Best-of-3 snapshot throughput per provider, budget-aware. The
    * 45 s floor sits well above the metric's ~13 s nominal runtime:
    * a floor below it would let a budget-exhausted pass 0 kill a
    * healthy run mid-batch and ship a truncated figure.
    */
  private def snapshotBestOf(spark: SparkSession, provider: Option[String],
      budget: WallBudget): Long =
    bestOf(budget, 45L, 90L)(cap =>
      snapshotEventsPerSec(spark, provider, capSec = cap))

  def snapshotEventsPerSecDefault(spark: SparkSession,
      budget: WallBudget = unbounded): Long =
    snapshotBestOf(spark, None, budget)
  def snapshotEventsPerSecRocksDb(spark: SparkSession,
      budget: WallBudget = unbounded): Long =
    snapshotBestOf(spark, Some(RocksDb), budget)
}
