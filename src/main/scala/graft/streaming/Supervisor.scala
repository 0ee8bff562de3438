package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.StreamingQuery

/** Restart policy for a supervised streaming query — the Spark-native
  * analogue of the reference's exit-and-let-the-supervisor-restart
  * discipline: on cursor invalidation (collection drop etc.) the
  * reference's reader loop simply ends (`change_stream_reading/
  * watch.py:86-91` — the stream context stops being `alive`), the
  * manager detects the dead worker and the whole process restarts
  * from the saved token (`managing/manager.py:225-230`).
  *
  * @param maxRestarts   consecutive failures tolerated before the
  *                      terminal exception propagates to the caller
  * @param initialBackoffMs first-restart delay; doubles per
  *                      consecutive failure (bounded below)
  * @param maxBackoffMs  backoff ceiling
  * @param resetAfterMs  a query that ran at least this long before
  *                      failing resets the consecutive-failure count
  *                      (a long-healthy stream dying is a fresh
  *                      incident, not failure n+1 of the last one)
  */
final case class RestartPolicy(
    maxRestarts: Int = 5,
    initialBackoffMs: Long = 500L,
    maxBackoffMs: Long = 30000L,
    resetAfterMs: Long = 60000L)

/** Supervision loop: build + start the query (from its checkpoint —
  * restart-from-checkpoint IS resume-from-token, C5), await
  * termination, and on failure restart with bounded exponential
  * backoff. A clean termination (stop() called, or the trigger ran
  * the source dry) ends supervision; only failures restart.
  *
  * Delivery across restarts stays at-least-once: the checkpoint's
  * offset log replays the failed micro-batch into the restarted
  * query, so an invalidate-killed batch is never lost (the no-loss
  * test drives exactly that path through the replay source).
  *
  * `sleep` is injectable so specs run backoff without wall-clock
  * waits.
  */
final class Supervisor(
    build: () => StreamingQuery,
    policy: RestartPolicy = RestartPolicy(),
    onRestart: (Int, Throwable) => Unit = (_, _) => (),
    sleep: Long => Unit = Thread.sleep) {

  @volatile private var currentQuery: Option[StreamingQuery] = None
  @volatile private var stopping = false
  private val restartCount = new AtomicInteger(0)
  private val lock = new Object

  /** The live query, while one is running. */
  def current: Option[StreamingQuery] = currentQuery

  /** Total restarts performed (not reset by resetAfterMs). */
  def restarts: Int = restartCount.get

  /** Stop supervision: no further restarts; the live query stops.
    * Synchronized with the build/register window in run() so a stop()
    * landing between query start and registration still stops the
    * query (run() re-checks `stopping` under the same lock after
    * registering).
    */
  def stop(): Unit = lock.synchronized {
    stopping = true
    currentQuery.foreach(_.stop())
  }

  /** Blocking supervision loop. Throws the last failure once the
    * consecutive-failure budget is spent. Failures *starting* the
    * query (build() itself — e.g. a transient checkpoint-store read
    * error) restart like mid-run failures: the reference's supervisor
    * restarts a worker that dies at any phase.
    */
  def run(): Unit = {
    var consecutive = 0
    while (!stopping) {
      val startedNs = System.nanoTime()
      try {
        val q = build()
        lock.synchronized {
          currentQuery = Some(q)
          if (stopping) q.stop()
        }
        q.awaitTermination()
        // clean termination: stop() was called or the query finished
        stopping = true
      } catch {
        case scala.util.control.NonFatal(e) =>
          // Shutdown path: propagate instead of returning "clean" —
          // if q.stop() timed out (spark.sql.streaming.stopTimeout)
          // the query may still be running, and the caller needs both
          // the failure and the retained `current` handle to act.
          if (stopping) throw e
          currentQuery = None
          val ranMs = (System.nanoTime() - startedNs) / 1000000L
          if (ranMs >= policy.resetAfterMs) consecutive = 0
          consecutive += 1
          if (consecutive > policy.maxRestarts) throw e
          restartCount.incrementAndGet()
          onRestart(restartCount.get, e)
          val shift = math.min(consecutive - 1, 20)
          sleep(math.min(policy.maxBackoffMs,
            policy.initialBackoffMs << shift))
      }
    }
  }
}
