package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAsofState._

/** Pins the continuous as-of enrichment: bit-exact batch equivalence
  * against the oracle-checked cdc_asof_state on ordered replay of the
  * corpus events, in-batch ordering, redelivery stability, and state
  * carried through RocksDB.
  */
class StreamingAsofStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // the same change-stream projection the batch query runs on
  // (dataEvents semantics, pinned by cdc_asof_state's oracle)
  private def corpusEvents(): Seq[Ev] = {
    import spark.implicits._
    graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase", "signup", "view"))
      .select(col("event_id"), col("user_id"),
        when(col("event_type") === "purchase", "c")
          .when(col("event_type").isin("click", "view"), "u")
          .otherwise("d").alias("op"),
        round(col("value") * 100, 0).cast(LongType).alias("cents"))
      .as[Ev].collect().sortBy(_.event_id).toSeq
  }

  test("ordered replay reproduces the batch cdc_asof_state rows exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val want = graft.SparkEntry.queries("cdc_asof_state")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5))).toSet
    val evs = corpusEvents()
    val in = MemoryStream[Ev]
    val q = enrich(in.toDS())
      .writeStream.format("memory").queryName("asof_replay")
      .outputMode("append").start()
    try {
      // replay in two chunks to cross a micro-batch boundary mid-stream
      val (a, b) = evs.splitAt(evs.length / 2)
      in.addData(a: _*); q.processAllAvailable()
      in.addData(b: _*); q.processAllAvailable()
      val got = spark.table("asof_replay").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getLong(5))).toSet
      assert(got === want, "stream diverged from the batch as-of join")
    } finally q.stop()
  }

  test("in-batch ordering and redelivery stability") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = enrich(in.toDS())
      .writeStream.format("memory").queryName("asof_replay2")
      .outputMode("append").start()
    try {
      // state change and purchase arrive in ONE batch, out of order:
      // the purchase (id 3) must see the id-2 state, not cold-start
      in.addData(Ev(3L, 7L, "c", 500L), Ev(2L, 7L, "u", 100L))
      q.processAllAvailable()
      // redelivery emits nothing and mutates nothing
      in.addData(Ev(3L, 7L, "c", 500L), Ev(2L, 7L, "u", 100L))
      q.processAllAvailable()
      // a later purchase still sees the id-2 state (not corrupted)
      in.addData(Ev(4L, 7L, "c", 900L)); q.processAllAvailable()
      val got = spark.table("asof_replay2").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(5))).toSet
      assert(got === Set((3L, 2L, 100L), (4L, 2L, 100L)))
    } finally q.stop()
  }

  test("as-of state carries across micro-batches under RocksDB") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Ev]
      val q = enrich(in.toDS())
        .writeStream.format("memory").queryName("asof_rocks")
        .outputMode("append").start()
      try {
        in.addData(Ev(1L, 9L, "u", 250L)); q.processAllAvailable()
        in.addData(Ev(2L, 9L, "c", 700L)); q.processAllAvailable()
        val got = spark.table("asof_rocks").collect()
          .map(r => (r.getLong(0), r.getLong(3), r.getString(4),
            r.getLong(5)))
        assert(got.toSeq === Seq((2L, 1L, "u", 250L)),
          "as-of state lost across RocksDB batch boundary")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
