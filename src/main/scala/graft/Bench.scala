package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully
  * evaluated through the noop sink (a bare .count() would let Catalyst
  * prune projection work and under-measure).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Per-query watchdog: host contention bursts stretch a ~1 s query
    // to minutes (observed 174×), and one such sample would eat the
    // whole sweep budget — starving every later query of its chance at
    // a calm-window minimum. Past the cap the query's job group is
    // cancelled and the sample recorded AT the cap (an honest upper
    // bound that any later clean sweep improves on), so a burst costs
    // at most capSec, not the budget. Every query here runs ≤ ~5 s
    // warm on a calm host — the cap only ever fires under contention.
    val capSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_CAP_SEC", "60").toLong

    def run(name: String): Double = {
      // isolate queries: drop caches/broadcasts from earlier queries
      // so measurements don't depend on run order or GC debt
      spark.catalog.clearCache()
      val group = s"bench-$name-${System.nanoTime()}"
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      @volatile var capped = false
      val watchdog = new Thread(() => {
        try {
          Thread.sleep(capSec * 1000L)
          capped = true
          spark.sparkContext.cancelJobGroup(group)
        } catch { case _: InterruptedException => () }
      })
      watchdog.setDaemon(true)
      watchdog.start()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case _: Throwable if capped =>
          System.err.println(s"[bench] $name capped at ${capSec}s (contention)")
          capSec.toDouble
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      } finally {
        watchdog.interrupt()
        spark.sparkContext.clearJobGroup()
      }
    }

    // Warm the JVM/codegen once on the cheapest query so the first
    // measured number isn't dominated by classloading.
    run("p3_topic_route")

    // This VM sees bursty multi-minute host stalls (observed: the same
    // trivial query at 94s then 4s with no plan change). Back-to-back
    // passes of one query both land inside a burst, so instead run
    // full sweeps over all queries and keep the per-query min across
    // sweeps — samples of each query are separated by a whole sweep
    // (~1-2 min), longer than most bursts. A wall-clock budget stops
    // extra sweeps so the JSON line always prints within the driver's
    // window.
    val names = SparkEntry.queries.keys.toSeq.sorted
    // As many sweeps as fit the budget: host-contention bursts here
    // last minutes, so the more time-separated samples per query, the
    // better the odds one lands in a calm window.
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "99").toInt
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BUDGET_SEC", "450").toLong
    val tStart = System.nanoTime()
    def elapsedSec = (System.nanoTime() - tStart) / 1e9
    val best = collection.mutable.Map.empty[String, Double]
    var sweep = 0
    while (sweep < sweeps && (sweep == 0 || elapsedSec < budgetSec)) {
      // Different deterministic order each sweep: contention bursts
      // span many minutes, so a fixed order lets one burst shadow the
      // same alphabetical block of queries in every sweep; shuffling
      // decorrelates burst position from query identity.
      val order = names.sortBy(n =>
        scala.util.hashing.MurmurHash3.stringHash(s"$n#$sweep"))
      for (n <- order) {
        // sweep 0 must finish (every query needs >= 1 sample); later
        // sweeps also stop mid-sweep so a contention stall can't push
        // the run past the budget by a whole sweep
        if (sweep == 0 || elapsedSec < budgetSec) {
          val t = run(n)
          if (t >= 0 && t < best.getOrElse(n, Double.MaxValue)) best(n) = t
        }
      }
      sweep += 1
    }
    val results = names.map(n => n -> best.getOrElse(n, -1.0))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A query whose BEST sample is still the cap never completed in
    // any sweep — a real failure signal (regression/hang), not a
    // timing. Surface it instead of letting capSec read as measured.
    val cappedFinal = results.collect {
      case (n, v) if v == capSec.toDouble => "\"" + n + "\""
    }.mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Reference-comparable headline: events/s through the CDC envelope
    // path (filter + envelope + routing — the reference's whole data
    // plane, `change_handler.py` + `change_event_handler.py`).
    val eventsPerSec = best.get("p1_cdc_envelope").filter(_ > 0).map { sec =>
      val n = Tables.events(spark, sfDir).count()
      (n / sec).round
    }.getOrElse(-1L)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"capped":$cappedFinal,"envelope_events_per_sec":$eventsPerSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
