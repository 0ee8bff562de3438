package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSourceCap._

/** Pins the at-ingest per-source cap: budget honored across
  * micro-batches, verdicts immutable under redelivery, state carried
  * through RocksDB.
  */
class StreamingSourceCapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private def verdicts(table: String): Map[Long, (Boolean, Long)] =
    spark.table(table).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap

  test("first-K-arrivals admitted per source, budget spans batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = admit(in.toDS(), cap = 2)
      .writeStream.format("memory").queryName("cap_basic")
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, "a"), Doc(2L, "a"), Doc(3L, "b"))
      q.processAllAvailable()
      // source a is now at budget; the next a-doc must be rejected
      // even though it arrives in a fresh batch (state crossed over)
      in.addData(Doc(4L, "a"), Doc(5L, "b"))
      q.processAllAvailable()
      assert(verdicts("cap_basic") === Map(
        1L -> ((true, 1L)), 2L -> ((true, 2L)), 3L -> ((true, 1L)),
        4L -> ((false, 2L)), 5L -> ((true, 2L))))
    } finally q.stop()
  }

  test("redelivered and stale docs emit nothing and consume no budget") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = admit(in.toDS(), cap = 2)
      .writeStream.format("memory").queryName("cap_replay")
      .outputMode("append").start()
    try {
      val batch = Seq(Doc(10L, "a"), Doc(11L, "a"))
      in.addData(batch: _*); q.processAllAvailable()
      val rows = spark.table("cap_replay").count()
      // resume-token replay: same docs again — a budget-consuming
      // replay would mark source a over-budget forever
      in.addData(batch: _*); q.processAllAvailable()
      assert(spark.table("cap_replay").count() === rows,
        "replayed docs must emit nothing")
      // a genuinely new doc still gets a verdict against the true count
      in.addData(Doc(12L, "a")); q.processAllAvailable()
      assert(verdicts("cap_replay")(12L) === ((false, 2L)))
    } finally q.stop()
  }

  test("cap state carries across micro-batches under RocksDB") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Doc]
      val q = admit(in.toDS(), cap = 1)
        .writeStream.format("memory").queryName("cap_rocks")
        .outputMode("append").start()
      try {
        in.addData(Doc(1L, "x")); q.processAllAvailable()
        in.addData(Doc(2L, "x")); q.processAllAvailable()
        assert(verdicts("cap_rocks") === Map(
          1L -> ((true, 1L)), 2L -> ((false, 1L))),
          "budget state lost across RocksDB batch boundary")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
