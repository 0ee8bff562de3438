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
  def envelopeEventsPerSec(
      spark: SparkSession,
      n: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "300000").toInt,
      capSec: Long = 60L): Long = {
    val fixture = s"bench-stream-${System.nanoTime()}"
    val opts = ChangeEventReplaySource.register(fixture, syntheticEvents(n))
    try (1 to 3).map(_ => onePass(spark, opts, n, capSec)).max
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
      capSec: Long = 60L): Long =
    withProvider(spark, Some(RocksDb))(envelopeEventsPerSec(spark, n, capSec))

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
      val perBatch = math.max(1, n / batches)
      val t0 = System.nanoTime()
      try {
        var b = 0
        while (b < batches && !capped) {
          val data = (0 until perBatch).map { j =>
            val id = b.toLong * perBatch + j
            Change(key = id % nKeys, eventId = id,
              op = if (id % 10 == 9) "d" else "u",
              doc = s"""{"a": $id}""", cents = id)
          }
          in.addData(data)
          q.processAllAvailable()
          b += 1
        }
        val wallSec = (System.nanoTime() - t0) / 1e9
        q.stop()
        val processed = b.toLong * perBatch
        if (processed > 0) (processed / wallSec).round else -1L
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

  /** Best-of-3 snapshot throughput per provider. */
  def snapshotEventsPerSecDefault(spark: SparkSession): Long =
    (1 to 3).map(_ => snapshotEventsPerSec(spark, None)).max
  def snapshotEventsPerSecRocksDb(spark: SparkSession): Long =
    (1 to 3).map(_ => snapshotEventsPerSec(spark, Some(RocksDb))).max
}
