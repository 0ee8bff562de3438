package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.streaming.StreamingGapDetect._

/** Pins the at-ingest gap alerter: emitted ranges equal the batch
  * cdc_gap_detect hole set on the real corpus, no re-alert under
  * redelivery, and high-water state carried under RocksDB.
  */
class StreamingGapDetectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("emitted ranges equal the batch hole set on corpus replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the same data-op stream the batch query scans, one topic
    val dataIds = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase", "signup", "view"))
      .select("event_id").collect().map(_.getLong(0)).sorted
    val batchHoles = graft.SparkEntry.queries("cdc_gap_detect")(spark, sf)
      .collect().map(_.getLong(0)).toSet
      // the stream anchors at its first id: holes before it (or after
      // the last) are invisible to an at-ingest detector
      .filter(id => id > dataIds.head && id < dataIds.last)

    val in = MemoryStream[Ev]
    val q = detect(in.toDS())
      .writeStream.format("memory").queryName("gaps_parity")
      .outputMode("append").start()
    try {
      dataIds.grouped(dataIds.length / 3 + 1).foreach { chunk =>
        in.addData(chunk.toIndexedSeq.map(Ev(_, "cdc.events")): _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("gaps_parity").as[Gap].collect()
      val expanded = streamed.flatMap(g => g.from_id to g.to_id).toSet
      assert(expanded === batchHoles,
        "streamed gap ranges must expand to the batch hole set")
      streamed.foreach(g => assert(g.width === g.to_id - g.from_id + 1L))
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("redelivery emits nothing; per-topic sequences are independent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = detect(in.toDS())
      .writeStream.format("memory").queryName("gaps_replay")
      .outputMode("append").start()
    try {
      in.addData(Ev(1L, "a"), Ev(2L, "a"), Ev(5L, "a"), Ev(9L, "b"))
      q.processAllAvailable()
      val first = spark.table("gaps_replay").as[Gap].collect()
      assert(first.toSet === Set(Gap("a", 3L, 4L, 2L)),
        "one range for the 3-4 hole; topic b only anchors")
      // resume-token replay of the same batch: no duplicate alert
      in.addData(Ev(5L, "a")); q.processAllAvailable()
      assert(spark.table("gaps_replay").count() === 1)
      // topic b continues from ITS high-water, not topic a's
      in.addData(Ev(11L, "b")); q.processAllAvailable()
      val all = spark.table("gaps_replay").as[Gap].collect().toSet
      assert(all === Set(Gap("a", 3L, 4L, 2L), Gap("b", 10L, 10L, 1L)))
    } finally q.stop()
  }

  test("high-water carries across micro-batches under RocksDB") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Ev]
      val q = detect(in.toDS())
        .writeStream.format("memory").queryName("gaps_rocks")
        .outputMode("append").start()
      try {
        in.addData(Ev(1L, "x")); q.processAllAvailable()
        in.addData(Ev(4L, "x")); q.processAllAvailable()
        val got = spark.table("gaps_rocks").as[Gap].collect().toSet
        assert(got === Set(Gap("x", 2L, 3L, 2L)),
          "high-water lost across RocksDB batch boundary")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
