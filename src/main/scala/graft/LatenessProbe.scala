package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingLateness
import graft.streaming.StreamingLateness.{Ev, Late}

/** Ad-hoc throughput probe for the at-ingest lateness monitor:
  * `runMain graft.LatenessProbe [nEvents] [nKeys]` drives
  * [[StreamingLateness.observe]] through MemoryStream → foreachBatch
  * with a workload whose every 5th event arrives event-time-inverted
  * WITHIN its key (keys get consecutive arrival ids, so the
  * inversion depth is intra-key — the monitor's real work), prints
  * events/s (best of 3, warm-up excluded) and the late-row count so
  * a bogus run (zero state work) is self-evident.
  */
object LatenessProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(300000)
    val nKeys = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val perKey = math.max(1, n / nKeys)
    val batches = 10
    val spark = GraftSession.local()
    GraftSession.applyEnvConf(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val data = (0 until batches).map { b =>
      (0 until n / batches).map { j =>
        val i = b.toLong * (n / batches) + j
        Ev(i, i / perKey,
          "u", (if (i % 5 == 4) i - 3 else i) * 1000000L)
      }
    }
    var best = -1L
    var lateTotal = 0L
    for (pass <- 1 to 3) {
      val in =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
      val late = new java.util.concurrent.atomic.AtomicLong
      val ckpt = java.nio.file.Files.createTempDirectory("lateness_probe")
      val q = StreamingLateness.observe(in.toDS()).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.ProcessingTime(0L))
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Late], _: Long) =>
          late.addAndGet(b.count()); ()
        }
        .start()
      try {
        in.addData(data.head: _*)
        q.processAllAvailable() // warm-up batch
        val t0 = System.nanoTime()
        data.tail.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        val wall = (System.nanoTime() - t0) / 1e9
        val evps = ((n - n / batches) / wall).round
        println(f"[lateness] pass $pass: $evps ev/s " +
          f"(wall $wall%.2f s, late=${late.get})")
        best = math.max(best, evps)
        lateTotal = late.get
      } finally {
        q.stop()
        // best-effort checkpoint cleanup (the StateProbe discipline)
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }
      }
    }
    require(lateTotal > 0, "workload produced no late rows — bogus run")
    println(s"""{"lateness_events_per_sec":$best,"late_rows":$lateTotal}""")
    spark.stop()
  }
}
