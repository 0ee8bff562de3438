package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingSnapshot
import graft.streaming.StreamingSnapshot.Change

/** State-growth probe for the state-store-BOUND streaming figure:
  * how does the StreamingSnapshot keyed-upsert rate decay as LIVE
  * KEY cardinality (= state size) grows ×1/×10/×100 past the bench's
  * 50k-key configuration — the 100-TB question the single-point
  * bench number can't answer (a keyed CDC snapshot at scale holds
  * every live key; RocksDB's pitch is precisely that this state
  * spills to local disk instead of executor heap).
  *
  * Method, per (nKeys, provider): seed one upsert per key in large
  * un-timed batches (state reaches exactly nKeys live rows), then
  * measure a fixed workload — 150k upserts spread uniformly over the
  * existing key space across 10 micro-batches — so every measured
  * batch loads, mutates, and commits state at the target size. The
  * measured workload is IDENTICAL at every key count; only the state
  * size behind it changes.
  *
  * `runMain graft.StateProbe [keysCsv]` (default 50000,500000,5000000)
  * prints one line per cell:
  * `[state] keys=<n> provider=<default|rocksdb> seed=<sec> rate=<ev/s>`.
  */
object StateProbe {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** One probe cell. Returns (seedSec, measuredEventsPerSec); a cell
    * whose streaming work exceeds `capSec` is killed by the watchdog
    * and reports rate -1 (a stuck provider must not hang the rest of
    * the matrix — already-printed cells are the probe's output).
    */
  def cell(spark: SparkSession, nKeys: Long,
      provider: Option[String], capSec: Long = 900L): (Double, Long) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prior = spark.conf.getOption(ProviderKey)
    provider match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
    val ckpt = java.nio.file.Files.createTempDirectory("state_probe_ckpt")
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
      try {
        // ---- seed: one create per key, 500k-row batches, un-timed
        // (reported separately — it's the state-BUILD rate, a different
        // quantity than the steady-state upsert rate under test)
        val seedBatch = 500000L
        val tSeed = System.nanoTime()
        var k = 0L
        while (k < nKeys) {
          val hi = math.min(nKeys, k + seedBatch)
          in.addData((k until hi).map(id =>
            Change(key = id, eventId = id, op = "c",
              doc = s"""{"a": $id}""", cents = id)))
          q.processAllAvailable()
          k = hi
        }
        val seedSec = (System.nanoTime() - tSeed) / 1e9

        // ---- measure: fixed workload over the EXISTING keys
        val n = 150000
        val batches = 10
        val perBatch = n / batches
        // co-prime stride spreads hits uniformly over the key space
        val stride = 1000003L
        val batchData = (0 until batches).map { b =>
          (0 until perBatch).map { j =>
            val i = b.toLong * perBatch + j
            Change(key = (i * stride) % nKeys, eventId = nKeys + i,
              op = "u", doc = s"""{"a": $i}""", cents = i)
          }
        }
        val t0 = System.nanoTime()
        var done = 0
        batchData.foreach { d =>
          if (!capped) { in.addData(d); q.processAllAvailable(); done += 1 }
        }
        val wallSec = (System.nanoTime() - t0) / 1e9
        if (capped || done < batches) (seedSec, -1L)
        else (seedSec, (n / wallSec).round)
      } catch {
        // unconditional: a provider that fails to LOAD (not just one
        // that hangs) must yield a -1 cell, not abort the remaining
        // (keys, provider) matrix — the snapshotEventsPerSec contract
        case e: Throwable =>
          val why = if (capped) s"capped at ${capSec}s" else "failed"
          System.err.println(
            s"[state] cell keys=$nKeys $why: ${e.getMessage}")
          (-1.0, -1L)
      } finally {
        watchdog.interrupt()
        // best-effort: a stop() throw after a completed measurement
        // must not replace the valid (seedSec, rate) with a -1 cell;
        // an interrupt still restores the flag so the caller's loop
        // can abort instead of grinding through the remaining cells
        try q.stop() catch {
          case _: InterruptedException => Thread.currentThread().interrupt()
          case _: Throwable => ()
        }
      }
    } catch {
      // q.start() itself can throw (e.g. the provider class fails to
      // resolve before any batch runs) — same -1-cell contract
      case e: Throwable =>
        System.err.println(
          s"[state] cell keys=$nKeys failed to start: ${e.getMessage}")
        (-1.0, -1L)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val keyCounts = args.headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(50000L, 500000L, 5000000L))
    val spark = GraftSession.local()
    GraftSession.applyEnvConf(spark)
    for (nKeys <- keyCounts;
        (pname, p) <- Seq("default" -> None, "rocksdb" -> Some(RocksDb))) {
      val (seedSec, rate) = cell(spark, nKeys, p)
      println(f"[state] keys=$nKeys provider=$pname " +
        f"seed=$seedSec%.1f rate=$rate")
    }
    spark.stop()
  }
}
