package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, size, split}
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.queries.TextQueries
import graft.streaming.StreamingPack._

/** Pins the at-ingest sequence packer: exact (bin, offset) parity
  * with the batch tx_pack layout on the real corpus replayed in
  * order, placement immutability under redelivery, and state carried
  * across micro-batches under RocksDB.
  */
class StreamingPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("streamed placements equal the batch tx_pack layout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = TextQueries.queries("tx_pack")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").alias("n_tokens"))
      .as[Doc].collect().sortBy(_.doc_id)

    val in = MemoryStream[Doc]
    val q = pack(in.toDS(), TextQueries.PackLen.toLong)
      .writeStream.format("memory").queryName("pack_parity")
      .outputMode("append").start()
    try {
      // replay the corpus in total order across three micro-batches —
      // the layout a resume-token replay of the change stream delivers
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("pack_parity").as[Placement].collect()
        .map(p => p.doc_id -> ((p.lang, p.n_tokens, p.bin, p.offset)))
        .toMap
      assert(streamed.size === batch.size, "placement counts diverged")
      batch.foreach { case (id, row) =>
        assert(streamed(id) === row, s"doc $id placement diverged on stream")
      }
    } finally q.stop()
  }

  test("redelivered docs emit nothing and never move the layout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = pack(in.toDS(), packLen = 10L)
      .writeStream.format("memory").queryName("pack_replay")
      .outputMode("append").start()
    try {
      val batch = Seq(Doc(1L, "en", 6L), Doc(2L, "en", 6L))
      in.addData(batch: _*); q.processAllAvailable()
      val rows = spark.table("pack_replay").count()
      // resume-token replay: the same docs again — a run-advancing
      // replay would shift every later document's bin
      in.addData(batch: _*); q.processAllAvailable()
      assert(spark.table("pack_replay").count() === rows,
        "replayed docs must emit nothing")
      in.addData(Doc(3L, "en", 1L)); q.processAllAvailable()
      val p3 = spark.table("pack_replay").as[Placement].collect()
        .find(_.doc_id == 3L).get
      // run after {6, 6} is 12 → bin 1, offset 2 (NOT bin 2: the
      // replay consumed no tokens)
      assert((p3.bin, p3.offset) === ((1L, 2L)))
    } finally q.stop()
  }

  test("running layout carries across micro-batches under RocksDB") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Doc]
      val q = pack(in.toDS(), packLen = 10L)
        .writeStream.format("memory").queryName("pack_rocks")
        .outputMode("append").start()
      try {
        in.addData(Doc(1L, "en", 7L)); q.processAllAvailable()
        in.addData(Doc(2L, "en", 7L)); q.processAllAvailable()
        val byId = spark.table("pack_rocks").as[Placement].collect()
          .map(p => p.doc_id -> ((p.bin, p.offset))).toMap
        // doc 2 starts at run=7: bin 0, offset 7 — a state loss would
        // restart it at bin 0 offset 0
        assert(byId === Map(1L -> ((0L, 0L)), 2L -> ((0L, 7L))),
          "packing state lost across RocksDB batch boundary")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
