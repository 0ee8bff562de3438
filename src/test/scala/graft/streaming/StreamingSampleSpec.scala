package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.streaming.StreamingSample._

/** Pins the at-ingest bottom-k sampler: the materialized changelog
  * equals the batch bottom-K per language after full replay AND after
  * every prefix batch, each doc_id has at most one add and one evict,
  * redelivery is a no-op, and the key set survives RocksDB.
  */
class StreamingSampleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"
  private val K = 20

  private def corpusDocs(): Array[Doc] =
    Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map { r =>
        val h = scala.util.hashing.MurmurHash3
          .stringHash(r.getString(2)).toLong * 0x9E3779B97F4A7C15L
        Doc(r.getLong(0), r.getString(1), h)
      }.sortBy(_.doc_id)

  private def batchBottomK(docs: Seq[Doc]): Map[String, Set[Long]] =
    docs.groupBy(_.lang).map { case (lang, ds) =>
      lang -> ds.sortBy(d => (d.h, d.doc_id)).take(K).map(_.doc_id).toSet
    }

  test("materialized changelog equals batch bottom-K after every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = corpusDocs()

    val in = MemoryStream[Doc]
    val q = sample(in.toDS(), K)
      .writeStream.format("memory").queryName("samp_parity")
      .outputMode("append").start()
    try {
      val chunks = docs.grouped(docs.length / 3 + 1).toSeq
      var fed = Vector.empty[Doc]
      chunks.foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
        fed ++= chunk
        val log = spark.table("samp_parity").as[Change].collect()
        val materialized = log.groupBy(_.lang).map { case (lang, cs) =>
          val adds = cs.filter(_.action == "add").map(_.doc_id).toSet
          val evicts = cs.filter(_.action == "evict").map(_.doc_id).toSet
          lang -> (adds -- evicts)
        }
        assert(materialized === batchBottomK(fed),
          s"sample diverged from batch bottom-$K after ${fed.size} docs")
      }
      // changelog discipline: at most one add and one evict per doc,
      // and every evicted doc was added first
      val log = spark.table("samp_parity").as[Change].collect()
      log.groupBy(c => (c.lang, c.doc_id)).foreach { case (key, cs) =>
        assert(cs.count(_.action == "add") <= 1, s"double add for $key")
        assert(cs.count(_.action == "evict") <= 1, s"double evict for $key")
        if (cs.exists(_.action == "evict"))
          assert(cs.exists(_.action == "add"), s"evict without add for $key")
      }
    } finally q.stop()
  }

  test("redelivery emits nothing; eviction keeps the sample uniform-sized") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = sample(in.toDS(), k = 2)
      .writeStream.format("memory").queryName("samp_replay")
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, "en", 50L), Doc(2L, "en", 30L))
      q.processAllAvailable()
      // doc 3 has a smaller hash: evicts the current worst (doc 1)
      in.addData(Doc(3L, "en", 10L)); q.processAllAvailable()
      val log = spark.table("samp_replay").as[Change].collect()
      assert(log.count(_.action == "add") === 3)
      assert(log.filter(_.action == "evict").map(_.doc_id).toSeq === Seq(1L))
      // replay of an applied doc: silent
      val n = spark.table("samp_replay").count()
      in.addData(Doc(3L, "en", 10L)); q.processAllAvailable()
      assert(spark.table("samp_replay").count() === n)
      // a WORSE new doc changes nothing
      in.addData(Doc(4L, "en", 99L)); q.processAllAvailable()
      assert(spark.table("samp_replay").count() === n)
    } finally q.stop()
  }

  test("sample keys survive RocksDB batch boundaries") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Doc]
      val q = sample(in.toDS(), k = 1)
        .writeStream.format("memory").queryName("samp_rocks")
        .outputMode("append").start()
      try {
        in.addData(Doc(1L, "x", 20L)); q.processAllAvailable()
        // smaller key in a later batch must evict the stored one
        in.addData(Doc(2L, "x", 5L)); q.processAllAvailable()
        val log = spark.table("samp_rocks").as[Change].collect()
        assert(log.filter(_.action == "evict").map(_.doc_id).toSeq ===
          Seq(1L), "stored sample key lost across RocksDB boundary")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
