package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-(session, key, dir) memo for intermediate frames that several
  * queries share and that must stay persisted (interpreted
  * higher-order-function chains re-evaluate per reference otherwise).
  *
  * Two properties the bare `.persist()`-per-construction pattern
  * lacks:
  *  - one frame per logical input, so repeated query construction
  *    (e.g. the bench's 99 sweeps) reuses it instead of logging
  *    "already cached" warnings per build;
  *  - survives an external `spark.catalog.clearCache()` — the next
  *    access observes `storageLevel == NONE` and re-pins, instead of
  *    silently running unpersisted for the rest of the session.
  *
  * Residency is intentionally session-lifetime (the frames are small
  * relative to executor storage: signatures/quantized vectors, not
  * the corpus); at 100 TB the equivalent move is staging these to
  * parquet once and reading them back.
  */
private[queries] object QueryMemo {
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String),
      DataFrame]

  def cached(s: SparkSession, key: String, dir: String)(
      build: => DataFrame): DataFrame = {
    // evict entries of stopped sessions: without this the global map
    // pins dead sessions (and their plans) for the JVM's lifetime in
    // any driver that cycles sessions (the test suite does)
    memo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    val df = memo.getOrElseUpdate((s, key, dir), build)
    if (df.storageLevel == StorageLevel.NONE) df.persist()
    df
  }
}
